"""Multimodal media plumbing: video frame sampling, image resize, audio
features — deterministic fake codecs, real Spark batch shapes (same
contract as test_images)."""

import zlib

import numpy as np
import pandas as pd
import pytest

from barefoot_spark.sources import images as IM
from barefoot_spark.sources import media as MD


def test_video_container_roundtrip():
    data = MD.encode_video("vid-x", 24, 16, 5)
    offs = MD.video_frame_offsets(data)
    assert len(offs) == 5
    for i in range(5):
        fr = MD.decode_frame(data, offs, i, 24, 16)
        assert fr.shape == (16, 24, 3)
        np.testing.assert_array_equal(fr, MD.synth_frame("vid-x", i, 24, 16))
    with pytest.raises(NotImplementedError):
        MD.decode_frame(data, offs, 0, 24, 16, codec="h264")


def test_sample_frames_spark(spark):
    pdf = MD.synth_videos_pdf(6, w=24, h=16, n_frames=10, fps=4.0)
    out = MD.sample_frames(spark.createDataFrame(pdf), every_n=4) \
        .toPandas().sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    # every 4th frame plus the last: {0, 4, 8, 9} per video
    assert len(out) == 6 * 4
    assert sorted(set(out["frame_idx"])) == [0, 4, 8, 9]
    # sampled frames are bit-exact vs direct decode, timestamps = idx/fps
    for r in out.itertuples(index=False):
        want = MD.synth_frame(r.video_id, r.frame_idx, 24, 16)
        got = np.frombuffer(zlib.decompress(r.frame),
                            dtype=np.uint8).reshape(16, 24, 3)
        np.testing.assert_array_equal(got, want)
        assert r.t_s == pytest.approx(r.frame_idx / 4.0)


def test_sample_frames_partition_invariance(spark):
    pdf = MD.synth_videos_pdf(8, n_frames=8)
    one = MD.sample_frames(spark.createDataFrame(pdf).coalesce(1), 3) \
        .toPandas().sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    many = MD.sample_frames(spark.createDataFrame(pdf).repartition(16), 3) \
        .toPandas().sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    assert one["frame"].map(bytes).tolist() == many["frame"].map(bytes).tolist()


def test_resize_images_box_filter_oracle(spark):
    pdf = IM.synth_images_pdf(10, w=32, h=24)
    out = MD.resize_images(spark.createDataFrame(pdf), 16, 12).toPandas()
    assert set(out["w"]) == {16} and set(out["h"]) == {12}
    by_id = {r.image_id: r for r in out.itertuples(index=False)}
    for r in pdf.itertuples(index=False):
        src = IM.decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        want = src.reshape(12, 2, 16, 2, 3).astype(np.float64) \
            .mean(axis=(1, 3)).round().astype(np.uint8)
        got_row = by_id[r.image_id]
        got = IM.decode_image(bytes(got_row.bytes), 16, 12, got_row.fmt)
        if r.fmt == "png":
            np.testing.assert_array_equal(got, want)
        else:
            # fake-jpeg is lossy by contract: quantized to ~2 LSBs
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 3


def test_audio_features_numpy_oracle(spark):
    pdf = MD.synth_audio_pdf(8, sr=8000, seconds=1.0)
    out = MD.audio_features(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 8
    by_id = {r.audio_id: r for r in out.itertuples(index=False)}
    for r in pdf.itertuples(index=False):
        x = MD.decode_audio(bytes(r.bytes)).astype(np.float64)
        want_rms = float(np.sqrt(np.mean(x * x)))
        g = by_id[r.audio_id]
        assert g.rms == pytest.approx(want_rms, rel=1e-6)
        assert 0.0 < g.zcr < 1.0
        # centroid must sit inside the synthesized tone band
        assert 50.0 < g.spectral_centroid_hz < 4000.0
        assert g.n_samples == 8000
    # determinism: same ids -> same features
    out2 = MD.audio_features(
        spark.createDataFrame(MD.synth_audio_pdf(8, sr=8000, seconds=1.0))) \
        .toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("audio_id").reset_index(drop=True),
        out2.sort_values("audio_id").reset_index(drop=True))


def test_audio_codec_stub():
    with pytest.raises(NotImplementedError):
        MD.decode_audio(b"xx", codec="mp3")
    with pytest.raises(NotImplementedError):
        MD.encode_audio(np.zeros(4, np.int16), codec="opus")


def test_video_phash_dedup_matches_bruteforce(spark):
    """Banded frame-0 candidates + all-positions verify == O(n^2) numpy
    brute force over the planted near-dup video corpus."""
    from barefoot_spark.sources import media as MM
    from barefoot_spark.sources.images import phash64

    pdf = MM.synth_videos_with_dups_pdf(48)
    videos = spark.createDataFrame(pdf, schema=MM.VIDEOS_SCHEMA)
    out = MM.video_phash_dedup(videos, every_n=4, max_hamming=3).toPandas()
    got = {(r.left_id, r.right_id) for r in out.itertuples(index=False)}

    # brute force: decode every container directly
    sigs = {}
    for r in pdf.itertuples(index=False):
        data = bytes(r.bytes)
        offs = MM.video_frame_offsets(data)
        idxs = sorted(set(range(0, r.n_frames, 4)) | {r.n_frames - 1})
        sigs[r.video_id] = [phash64(MM.decode_frame(data, offs, i, r.w, r.h))
                            for i in idxs]
    ids = sorted(sigs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sigs[ids[i]], sigs[ids[j]]
            m64 = (1 << 64) - 1   # two's-complement view: int64 phashes
            if len(a) == len(b) and all(
                    bin((x ^ y) & m64).count("1") <= 3 for x, y in zip(a, b)):
                want.add((ids[i], ids[j]))
    assert got == want and len(want) > 0
    assert (out.max_hamming_seen <= 3).all()
