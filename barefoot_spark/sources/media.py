"""Multimodal media columns: video and audio as opaque binary columns
with typed metadata, plus the image resize transform.

Same contract as sources/images.py: the SPARK-SIDE PLUMBING is real —
schemas, mapInPandas batch shapes, 1:N frame explosion, partitioning —
while the byte-level codecs are deterministic stand-ins (zlib frame
store / raw PCM), because this container ships no media libraries.
Real-format decode (H.264, MP3, ...) is stubbed behind
NotImplementedError exactly like images.decode_image; every transform
downstream of decode (resize math, frame indexing, RMS/ZCR/spectral
features) is real numpy and tested against independent oracles.

Video container (fake, indexed): header ``n_frames``, then per frame a
4-byte length + zlib(frame RGB bytes) — an index-seekable layout so
frame sampling decodes ONLY the sampled frames, the property a real
container (keyframe index) gives you at scale.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import codecs
from .images import _id_seed, synth_pixels

VIDEOS_SCHEMA = StructType([
    StructField("video_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("n_frames", IntegerType(), False),
    StructField("fps", DoubleType(), False),
])

AUDIO_SCHEMA = StructType([
    StructField("audio_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("sr", IntegerType(), False),
    StructField("n_samples", IntegerType(), False),
    StructField("codec", StringType(), False),
])


# ---------------------------------------------------------------------------
# deterministic synthesis + fake codecs
# ---------------------------------------------------------------------------

def synth_frame(video_id: str, idx: int, w: int, h: int) -> np.ndarray:
    """Frame = the video's base image shifted per frame index (motion),
    deterministic per (video_id, idx)."""
    base = synth_pixels(f"{video_id}", w, h)
    return np.roll(base, shift=idx * 3, axis=1)


def encode_video(video_id: str, w: int, h: int, n_frames: int) -> bytes:
    return codecs.get_video_codec().encode_frames(
        [synth_frame(video_id, i, w, h) for i in range(n_frames)])


def video_frame_offsets(data: bytes) -> list:
    """Scan the container index: [(offset, length)] per frame."""
    return codecs.get_video_codec().frame_offsets(data)


def decode_frame(data: bytes, offsets, idx: int, w: int, h: int,
                 codec: str = "fake") -> np.ndarray:
    return codecs.get_video_codec().decode_frame(data, offsets, idx,
                                                 w, h, codec)


def synth_videos_pdf(n: int, w: int = 24, h: int = 16,
                     n_frames: int = 12, fps: float = 4.0) -> pd.DataFrame:
    rows = []
    for i in range(n):
        vid = f"vid-{i:05d}"
        rows.append((vid, encode_video(vid, w, h, n_frames), w, h,
                     n_frames, fps))
    return pd.DataFrame(rows, columns=[f.name for f in VIDEOS_SCHEMA.fields])


def synth_pcm(audio_id: str, sr: int, n_samples: int) -> np.ndarray:
    """Deterministic mono int16 PCM: two seeded sine tones + noise."""
    rng = np.random.default_rng(_id_seed(audio_id) ^ 0xA0D10)
    t = np.arange(n_samples) / sr
    f1, f2 = rng.uniform(80, 400), rng.uniform(500, 3000)
    x = (0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
         + 0.05 * rng.standard_normal(n_samples))
    return np.clip(x * 32767 / 1.2, -32768, 32767).astype(np.int16)


def encode_audio(pcm: np.ndarray, codec: str = "pcm",
                 sr: int = 8000) -> bytes:
    """Codec seam (sources/codecs.py): resolves to soundfile when the
    library is installed, the zlib-PCM stand-in otherwise."""
    return codecs.get_audio_codec().encode(pcm, codec, sr)


def decode_audio(data: bytes, codec: str = "pcm") -> np.ndarray:
    return codecs.get_audio_codec().decode(data, codec)


def synth_audio_pdf(n: int, sr: int = 8000, seconds: float = 1.5) -> pd.DataFrame:
    ns = int(sr * seconds)
    rows = []
    for i in range(n):
        aid = f"aud-{i:05d}"
        rows.append((aid, encode_audio(synth_pcm(aid, sr, ns)), sr, ns, "pcm"))
    return pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])


# ---------------------------------------------------------------------------
# DataFrame transforms (mapInPandas — Arrow batches, binary projected
# before any shuffle)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = StructType([
    StructField("video_id", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("t_s", DoubleType(), False),
    StructField("frame", BinaryType(), False),   # zlib RGB (fake-png)
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
])


def sample_frames(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """1:N frame sampling: every_n-th frame plus the last, decoded
    straight from the container index (only sampled frames are
    decompressed — the keyframe-seek property)."""
    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.n_frames <= 0:
                    continue   # empty/corrupt container: no frames
                data = bytes(r.bytes)
                offs = video_frame_offsets(data)
                idxs = sorted(set(range(0, r.n_frames, every_n))
                              | {r.n_frames - 1})
                for i in idxs:
                    fr = decode_frame(data, offs, i, r.w, r.h)
                    rows.append((r.video_id, int(i), float(i / r.fps),
                                 zlib.compress(fr.tobytes(), 1),
                                 int(r.w), int(r.h)))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FRAME_SCHEMA.fields])

    cols = ["video_id", "bytes", "w", "h", "n_frames", "fps"]
    return videos.select(*cols).mapInPandas(run, FRAME_SCHEMA)


def resize_pixels(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average resize (integer box filter when shapes divide,
    nearest-bin otherwise) — pure numpy, exact and deterministic."""
    h, w, c = px.shape
    if h % out_h == 0 and w % out_w == 0:
        bh, bw = h // out_h, w // out_w
        return (px.reshape(out_h, bh, out_w, bw, c).astype(np.float64)
                .mean(axis=(1, 3)).round().astype(np.uint8))
    yi = (np.arange(out_h) * h // out_h)
    xi = (np.arange(out_w) * w // out_w)
    return px[yi][:, xi]


RESIZE_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("fmt", StringType(), False),
])


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode -> box-filter resize -> re-encode, one mapInPandas pass
    (images.decode_image / encode_image carry the codec contract)."""
    from . import images as IM

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = IM.decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                rz = resize_pixels(px, out_w, out_h)
                rows.append((r.image_id, IM.encode_image(rz, r.fmt),
                             out_w, out_h, r.fmt))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in RESIZE_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(run, RESIZE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("audio_id", StringType(), False),
    StructField("rms", DoubleType(), False),
    StructField("zcr", DoubleType(), False),
    StructField("spectral_centroid_hz", DoubleType(), False),
    StructField("peak", IntegerType(), False),
    StructField("n_samples", IntegerType(), False),
])


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip DSP features over the decoded PCM: RMS energy,
    zero-crossing rate, spectral centroid (rfft), peak amplitude."""
    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), r.codec).astype(np.float64)
                n = len(x)
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / r.sr)
                cen = float((spec * freqs).sum() / max(spec.sum(), 1e-12))
                rows.append((r.audio_id, round(rms, 6), round(zcr, 6),
                             round(cen, 6), int(np.abs(x).max()), n))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return audio.select("audio_id", "bytes", "sr", "n_samples", "codec") \
        .mapInPandas(run, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# video near-duplicate detection via sampled-frame phashes
# ---------------------------------------------------------------------------

FRAME_PHASH_SCHEMA = StructType([
    StructField("video_id", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("phash", LongType(), False),
])


def frame_phashes(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """Per-sampled-frame perceptual hashes: decode every_n-th frame
    (plus the last) straight from the container index and emit
    (video_id, frame_idx, phash). The binary column never leaves the
    kernel — downstream dedup shuffles 20 bytes/frame, not frames."""
    from .images import phash64

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.n_frames <= 0:
                    continue
                data = bytes(r.bytes)
                offs = video_frame_offsets(data)
                idxs = sorted(set(range(0, r.n_frames, every_n))
                              | {r.n_frames - 1})
                for i in idxs:
                    fr = decode_frame(data, offs, i, r.w, r.h)
                    rows.append((r.video_id, int(i), phash64(fr)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_PHASH_SCHEMA.fields])

    cols = ["video_id", "bytes", "w", "h", "n_frames", "fps"]
    return videos.select(*cols).mapInPandas(run, FRAME_PHASH_SCHEMA)


def video_phash_dedup(videos: DataFrame, every_n: int = 4,
                      max_hamming: int = 3) -> DataFrame:
    """Video near-duplicate pairs: two videos are near-dups iff they
    sample the SAME frame positions (same frame count under the 1:N
    policy) and EVERY corresponding sampled frame's phash is within
    ``max_hamming`` bits. Returns (left_id, right_id, n_frames_matched,
    max_hamming_seen).

    Pipeline shape (the 100-TB story): one decode pass emits the tiny
    (video, frame, phash) table; candidates come from an equi-join on
    (frame_idx, block, key) — the per-frame analog of phash_dedup's
    band pigeonhole, so any qualifying pair collides on at least one
    block of EVERY frame, in particular frame 0 — and the verify is a
    per-pair join over sampled positions only. Bytes are never
    shuffled; everything after the decode UDF is whole-stage codegen.
    """
    from pyspark.sql import functions as F
    fp = frame_phashes(videos, every_n).localCheckpoint(eager=True)
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = fp.select(
        "video_id", "frame_idx",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright("phash", i * width).bitwiseAND(
                         F.lit((1 << width) - 1)).alias("key"))
            for i in range(nblocks)])).alias("b")) \
        .select("video_id", "frame_idx", "b.blk", "b.key") \
        .filter(F.col("frame_idx") == 0)   # frame 0 collision is necessary
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (l.join(r, [F.col("l.frame_idx") == F.col("r.frame_idx"),
                       F.col("l.blk") == F.col("r.blk"),
                       F.col("l.key") == F.col("r.key"),
                       F.col("l.video_id") < F.col("r.video_id")])
            .select(F.col("l.video_id").alias("left_id"),
                    F.col("r.video_id").alias("right_id"))
            .dropDuplicates(["left_id", "right_id"]))
    cnt = fp.groupBy("video_id").agg(F.count("*").alias("nf"))
    lf = fp.select(F.col("video_id").alias("left_id"), "frame_idx",
                   F.col("phash").alias("lp"))
    rf = fp.select(F.col("video_id").alias("right_id"), "frame_idx",
                   F.col("phash").alias("rp"))
    ham = F.bit_count(F.col("lp").bitwiseXOR(F.col("rp")))
    agg = (cand.join(lf, "left_id").join(rf, ["right_id", "frame_idx"])
           .groupBy("left_id", "right_id")
           .agg(F.count("*").alias("n_frames_matched"),
                F.max(ham).alias("max_hamming_seen")))
    return (agg
            .join(cnt.withColumnRenamed("video_id", "left_id")
                  .withColumnRenamed("nf", "lnf"), "left_id")
            .join(cnt.withColumnRenamed("video_id", "right_id")
                  .withColumnRenamed("nf", "rnf"), "right_id")
            .filter((F.col("max_hamming_seen") <= max_hamming)
                    & (F.col("n_frames_matched") == F.col("lnf"))
                    & (F.col("n_frames_matched") == F.col("rnf")))
            .select("left_id", "right_id", "n_frames_matched",
                    "max_hamming_seen"))


def synth_videos_with_dups_pdf(n: int, dup_every: int = 3, w: int = 24,
                               h: int = 16, n_frames: int = 12,
                               fps: float = 4.0,
                               seed: int = 7) -> pd.DataFrame:
    """Video corpus with planted near-duplicates: every `dup_every`-th
    video re-encodes a recent base video's frames with one brightened
    8x8 block per frame (same perturbation recipe as
    images.synth_images_with_dups_pdf), so its sampled-frame phashes
    land within a few bits of the base's."""
    rng = np.random.default_rng(seed)
    codec = codecs.get_video_codec()
    rows = []
    for i in range(n):
        vid = f"vid-{i:05d}"
        if i % dup_every == dup_every - 1 and i > 0:
            base_i = int(rng.integers(max(0, i - 6), i))
            base_id = f"vid-{base_i:05d}"
            by, bx = int(rng.integers(0, 8)), int(rng.integers(0, 8))
            bh, bw = h // 8, w // 8
            frames = []
            for fidx in range(n_frames):
                px = synth_frame(base_id, fidx, w, h).astype(np.int16)
                px[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] += 96
                frames.append(np.clip(px, 0, 255).astype(np.uint8))
            data = codec.encode_frames(frames)
        else:
            data = encode_video(vid, w, h, n_frames)
        rows.append((vid, data, w, h, n_frames, fps))
    return pd.DataFrame(rows, columns=[f.name for f in VIDEOS_SCHEMA.fields])
