"""Image source + codec invariants (BASELINE.json input_hint):
deterministic synthesis, lossless png roundtrip, lossy jpeg PSNR>=40dB,
caption equality, phash stability, Spark verify/feature kernels."""

import numpy as np
import pytest

from barefoot_spark.sources import images as IM


def test_synthesis_deterministic():
    a = IM.synth_images_pdf(8)
    b = IM.synth_images_pdf(8)
    assert (a["image_id"] == b["image_id"]).all()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    assert (a["caption"] == b["caption"]).all()
    assert (a["phash"] == b["phash"]).all()


def test_png_roundtrip_lossless():
    px = IM.synth_pixels("img-x", 32, 24)
    enc = IM.encode_image(px, "png")
    dec = IM.decode_image(enc, 32, 24, "png")
    assert np.array_equal(px, dec)


def test_jpeg_psnr_above_40():
    for i in range(5):
        px = IM.synth_pixels(f"img-{i}", 32, 24)
        dec = IM.decode_image(IM.encode_image(px, "jpeg"), 32, 24, "jpeg")
        p = IM.psnr(px, dec)
        assert p >= 40.0, p


def test_unknown_format_raises():
    px = IM.synth_pixels("img-x", 8, 8)
    with pytest.raises(NotImplementedError):
        IM.encode_image(px, "webp")


def test_phash_similar_images_close():
    px = IM.synth_pixels("img-a", 32, 24)
    # jpeg-degraded copy keeps the same phash (average hash robustness)
    dec = IM.decode_image(IM.encode_image(px, "jpeg"), 32, 24, "jpeg")
    h1, h2 = IM.phash64(px), IM.phash64(dec)
    ham = bin((h1 ^ h2) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 4


def test_verify_images_spark(spark):
    pdf = IM.synth_images_pdf(64)
    df = spark.createDataFrame(pdf, schema=IM.IMAGES_SCHEMA)
    out = IM.verify_images(df).toPandas()
    assert len(out) == 64
    assert out["pixel_ok"].all()
    assert out["caption_ok"].all()
    assert out["phash_ok"].all()
    assert (out.loc[out.fmt == "jpeg", "psnr_db"] >= 40.0).all()


def test_image_features_spark(spark):
    pdf = IM.synth_images_pdf(16)
    df = spark.createDataFrame(pdf, schema=IM.IMAGES_SCHEMA)
    feats = IM.image_features(df).toPandas()
    assert len(feats) == 16
    assert (feats["brightness"] > 0).all()
    # bytes column is projected away before any shuffle: plan check
    plan = IM.image_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle at all in this op
