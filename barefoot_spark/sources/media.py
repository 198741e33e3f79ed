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
