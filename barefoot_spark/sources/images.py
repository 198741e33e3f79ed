"""Synthetic image+caption table (the driver-mandated input shape) and
the multimodal column plumbing.

Input schema per BASELINE.json input_hint:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).

The container ships no image codec libraries, so the codec here is a
deterministic stand-in with the real formats' *semantics* (documented
stub per the task brief): "png" is lossless (zlib over raw RGB) and
"jpeg" is lossy (6-bit/channel quantization + zlib, PSNR ≈ 47 dB —
above the 40 dB invariant). Pixels and captions derive deterministically
from image_id (seed 42), so any decode can be verified against an
independent re-synthesis — that is the per-row invariant
(decoded-pixel allclose / PSNR >= 40 dB + exact caption equality).
All Spark-side plumbing (schema, Arrow batches, mapInPandas kernels,
verification op) is real and tested; only the byte format itself is the
deterministic fake. The codec is resolved through the
``sources/codecs.py`` seam — installing Pillow in the cluster image is
the entire real-codec upgrade (every worker process resolves the
Pillow adapter at import time; no code change).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import codecs

IMAGES_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("fmt", StringType(), False),
    StructField("caption", StringType(), False),
    StructField("phash", LongType(), False),
])

_SEED = 42


def _id_seed(image_id: str) -> int:
    # deterministic, platform-independent
    h = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    return (h * 2654435761 + _SEED) & 0x7FFFFFFF


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Reference pixels for an image id: seeded smooth gradient + noise
    (h, w, 3) uint8."""
    rng = np.random.default_rng(_id_seed(image_id))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        (xx * rng.uniform(0.3, 3.0) + yy * rng.uniform(0.3, 3.0)),
        (xx * rng.uniform(0.3, 3.0) - yy * rng.uniform(0.3, 3.0)),
        (xx * rng.uniform(0.3, 3.0) * yy * 0.01),
    ], axis=-1)
    noise = rng.integers(0, 32, size=(h, w, 3))
    return ((base + noise) % 256).astype(np.uint8)


def synth_caption(image_id: str) -> str:
    rng = np.random.default_rng(_id_seed(image_id) ^ 0x5CA1AB1E)
    nouns = ["street", "junction", "bridge", "river", "rooftop", "park"]
    adjs = ["rainy", "sunlit", "foggy", "crowded", "empty", "snowy"]
    return (f"a {adjs[rng.integers(0, len(adjs))]} "
            f"{nouns[rng.integers(0, len(nouns))]} scene {image_id}")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Codec seam (sources/codecs.py): resolves to Pillow when the
    library is installed, the deterministic stand-in otherwise."""
    return codecs.get_image_codec().encode(pixels, fmt)


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    return codecs.get_image_codec().decode(data, w, h, fmt)


def phash64(pixels: np.ndarray) -> int:
    """8x8 block-mean average hash -> int64 (deterministic)."""
    h, w, _ = pixels.shape
    gray = pixels.astype(np.float64).mean(axis=2)
    bh, bw = max(1, h // 8), max(1, w // 8)
    blocks = gray[:bh * 8, :bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def synth_images_pdf(n: int, seed: int = _SEED, w: int = 32, h: int = 24) -> pd.DataFrame:
    """Deterministic image table; ~50/50 png/jpeg."""
    rows = []
    for i in range(n):
        image_id = f"img-{seed}-{i:08d}"
        fmt = "png" if (i % 2 == 0) else "jpeg"
        px = synth_pixels(image_id, w, h)
        rows.append((image_id, encode_image(px, fmt), w, h, fmt,
                     synth_caption(image_id), phash64(px)))
    return pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA.fields])


def synth_images_with_dups_pdf(n: int, dup_every: int = 4, seed: int = _SEED,
                               w: int = 32, h: int = 24) -> pd.DataFrame:
    """Deterministic image corpus with PLANTED near-duplicates for the
    phash-dedup path: every `dup_every`-th row stores a perturbed copy
    of a recent base image (one or two 8x8 phash blocks brightened),
    so its stored phash lands within a few bits of the base's. The
    table stays self-consistent — bytes encode the perturbed pixels
    and phash is computed FROM those pixels — but dup rows'
    pixels/captions do not re-derive from their own image_id, so this
    corpus is for dedup tests, not verify_images."""
    rng = np.random.default_rng(seed ^ 0xD0B)
    rows = []
    for i in range(n):
        image_id = f"img-{seed}-{i:08d}"
        fmt = "png" if (i % 2 == 0) else "jpeg"
        if i % dup_every == dup_every - 1 and i > 0:
            base_i = int(rng.integers(max(0, i - 16), i))
            px = synth_pixels(f"img-{seed}-{base_i:08d}", w, h)
            px = px.astype(np.int16)
            bh, bw = h // 8, w // 8
            for _ in range(int(rng.integers(1, 3))):
                by, bx = int(rng.integers(0, 8)), int(rng.integers(0, 8))
                px[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] += 96
            px = np.clip(px, 0, 255).astype(np.uint8)
        else:
            px = synth_pixels(image_id, w, h)
        rows.append((image_id, encode_image(px, fmt), w, h, fmt,
                     synth_caption(image_id), phash64(px)))
    return pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA.fields])


def synth_images_curation_pdf(n: int, seed: int = _SEED) -> pd.DataFrame:
    """Curation fixture: the planted-near-dup corpus PLUS degenerate
    rows that exercise every ``curate_images`` gate — tiny frames,
    banner-strip aspect ratios, non-whitelisted format labels, and
    malformed captions. Resized rows stay self-consistent (bytes and
    phash re-derive from the resized pixels); the format-label rows
    keep their original payload (the gate reads the fmt column, not
    the bytes)."""
    pdf = synth_images_with_dups_pdf(n, seed=seed)
    rng = np.random.default_rng(seed ^ 0xCA7)
    junk = ["", "!!!", "??? ### $$$", "zzzzzzz"]
    for i in range(n):
        image_id = pdf.at[i, "image_id"]
        if i % 17 == 5:          # tiny frame -> min-dimension gate
            w2, h2 = 12, 8
        elif i % 17 == 9:        # banner strip -> aspect gate
            w2, h2 = 64, 8
        else:
            w2 = h2 = None
        if w2 is not None:
            px = synth_pixels(image_id, w2, h2)
            pdf.at[i, "bytes"] = encode_image(px, pdf.at[i, "fmt"])
            pdf.at[i, "w"] = w2
            pdf.at[i, "h"] = h2
            pdf.at[i, "phash"] = phash64(px)
        if i % 17 == 13:         # non-whitelisted format label
            pdf.at[i, "fmt"] = "bmp"
        if i % 13 == 7:          # malformed caption -> caption gate
            pdf.at[i, "caption"] = junk[int(rng.integers(0, len(junk)))]
    return pdf


def synth_frame_stream_pdf(n_traj: int = 16, frames: int = 48,
                           seed: int = _SEED) -> pd.DataFrame:
    """Deterministic image-trajectory stream for frame thinning
    (traj_id, image_id, t, phash): consecutive frames mostly perturb
    0-2 phash bits of the previous frame (a static scene), with
    occasional cuts to a fresh hash; inter-frame time gaps vary in
    [1, 5] so the thinning time gate discriminates."""
    rng = np.random.default_rng(seed ^ 0xF7A3E5)
    rows = []
    for tr in range(n_traj):
        t = 0
        ph = np.uint64(rng.integers(0, 1 << 63, dtype=np.uint64))
        for fi in range(frames):
            t += int(rng.integers(1, 6))
            if rng.random() < 0.25:      # scene cut
                ph = np.uint64(rng.integers(0, 1 << 63, dtype=np.uint64))
            else:                        # near-identical frame
                for _ in range(int(rng.integers(0, 3))):
                    ph = ph ^ (np.uint64(1)
                               << np.uint64(rng.integers(0, 64)))
            rows.append((tr, f"frm-{tr:04d}-{fi:04d}", t,
                         int(ph.astype(np.int64))))
    return pd.DataFrame(rows, columns=["traj_id", "image_id", "t", "phash"])


def synth_geo_frames_pdf(n_traj: int = 48, frames: int = 32,
                         seed: int = _SEED) -> pd.DataFrame:
    """Deterministic geotagged image-frame table
    (traj_id, image_id, t, lat, lon, phash) with a planted hot cell:
    60% of trajectories random-walk inside ONE res-8 tile (the dense
    urban core of the north rule's "skew from dense urban cells"),
    the rest spread over the whole globe. Walks are clipped to stay
    strictly inside the downtown tile so the skew is exact, and
    phashes are full 64-bit (sign bit reachable) so the rollup's
    unsigned-shift scene bucketing is exercised on negative int64s."""
    from .. import cells
    edge = cells.res_edge_deg(8)
    # downtown tile midpoint (cells are aligned to -180/-90 lattices);
    # midpoint keeps the clipped walk a half-edge away from any border
    dlon = -180.0 + (np.floor((13.40 + 180.0) / edge) + 0.5) * edge
    dlat = -90.0 + (np.floor((52.52 + 90.0) / edge) + 0.5) * edge
    rng = np.random.default_rng(seed ^ 0x6E0F7A3)
    rows = []
    for tr in range(n_traj):
        if tr % 5 < 3:                  # 60% downtown -> one hot cell
            blat, blon, spread = dlat, dlon, edge * 0.2
        else:                           # wide-area trajectories
            blat = -60.0 + 120.0 * rng.random()
            blon = -170.0 + 340.0 * rng.random()
            spread = 5.0
        lat, lon = blat, blon
        ph = np.uint64(rng.integers(0, 1 << 64, dtype=np.uint64))
        t = 0
        for fi in range(frames):
            t += int(rng.integers(1, 6))
            lat = float(np.clip(lat + rng.normal(0.0, spread * 0.1),
                                blat - 0.45 * edge if tr % 5 < 3 else -89.0,
                                blat + 0.45 * edge if tr % 5 < 3 else 89.0))
            lon = float(np.clip(lon + rng.normal(0.0, spread * 0.1),
                                blon - 0.45 * edge if tr % 5 < 3 else -179.9,
                                blon + 0.45 * edge if tr % 5 < 3 else 179.9))
            if rng.random() < 0.25:     # scene cut
                ph = np.uint64(rng.integers(0, 1 << 64, dtype=np.uint64))
            else:                       # near-identical frame
                for _ in range(int(rng.integers(0, 3))):
                    ph = ph ^ (np.uint64(1)
                               << np.uint64(rng.integers(0, 64)))
            rows.append((tr, f"gfr-{tr:04d}-{fi:04d}", t, lat, lon,
                         int(ph.astype(np.int64))))
    return pd.DataFrame(
        rows, columns=["traj_id", "image_id", "t", "lat", "lon", "phash"])


_BOILERPLATE_CAPTIONS = ["untitled image", "photo", "image_0001.jpg"]


def synth_caption_reuse_pdf(n: int = 512, seed: int = _SEED) -> pd.DataFrame:
    """Curation corpus for the cross-modal consistency gate: plants
    (a) boilerplate captions shared across many DISTINCT images (crawl
    alt-text spam; every 7th row gets one of three stock strings) and
    (b) repeated images carrying DIFFERENT captions (every 11th row
    copies the previous row's pixels/bytes/phash but keeps its own
    caption — a mislabeled duplicate). Rows stay self-consistent with
    the codec invariant: bytes always decode to the pixels that hash
    to phash."""
    pdf = synth_images_pdf(n, seed=seed)
    for i in range(n):
        if i % 7 == 3:
            pdf.at[i, "caption"] = _BOILERPLATE_CAPTIONS[i % 3]
        if i % 11 == 5 and i > 0:
            for col in ("bytes", "w", "h", "fmt", "phash"):
                pdf.at[i, col] = pdf.at[i - 1, col]
    return pdf


VERIFY_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("fmt", StringType()),
    StructField("psnr_db", DoubleType()),
    StructField("pixel_ok", BooleanType()),
    StructField("caption_ok", BooleanType()),
    StructField("phash_ok", BooleanType()),
])


def verify_images(images: DataFrame) -> DataFrame:
    """Per-row invariant check (BASELINE.json input_hint): decode bytes,
    re-synthesize the reference pixels from image_id, assert
    allclose/PSNR>=40dB + caption equality + phash. mapInPandas — the
    whole image batch decodes inside one Arrow batch."""
    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                dec = decode_image(r.bytes, r.w, r.h, r.fmt)
                ref = synth_pixels(r.image_id, r.w, r.h)
                p = psnr(dec, ref)
                pixel_ok = bool(np.array_equal(dec, ref)) if r.fmt == "png" \
                    else bool(p >= 40.0)
                out.append((r.image_id, r.fmt, float(min(p, 1e9)), pixel_ok,
                            r.caption == synth_caption(r.image_id),
                            int(r.phash) == phash64(ref)))
            yield pd.DataFrame(out, columns=[f.name for f in VERIFY_SCHEMA.fields])

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return images.select(*cols).mapInPandas(run, VERIFY_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("brightness", DoubleType()),
    StructField("phash", LongType()),
])


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract stage (multimodal pipeline op): channel
    means, brightness, recomputed phash. Plumbing pattern for any
    decode-heavy stage: project only needed columns (never shuffle
    `bytes`), decode inside Arrow batches."""
    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_image(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
                m = px.mean(axis=(0, 1))
                out.append((r.image_id, m[0], m[1], m[2], float(px.mean()),
                            phash64(px.astype(np.uint8))))
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, FEATURE_SCHEMA)
