"""Per-cell image rollup (skew-safe) and caption consistency gate:
brute-force pandas twins + the planted hot-cell / spam fixtures."""

import numpy as np
import pandas as pd

from barefoot_spark import cells
from barefoot_spark.operators import datapipe, skew, tiles
from barefoot_spark.sources import images as IM


def _brute_rollup(pdf: pd.DataFrame, res: int = 8,
                  scene_bits: int = 12) -> pd.DataFrame:
    df = pdf.copy()
    df["cell"] = cells.latlng_to_cell(df["lat"].to_numpy(),
                                      df["lon"].to_numpy(), res)
    df["scene"] = (df["phash"].to_numpy().astype(np.int64)
                   .astype(np.uint64) >> np.uint64(64 - scene_bits)) \
        .astype(np.int64)
    out = df.groupby("cell").agg(
        n_frames=("image_id", "count"),
        n_trajs=("traj_id", "nunique"),
        n_scenes=("scene", "nunique"),
        t_min=("t", "min"), t_max=("t", "max")).reset_index()
    return out.sort_values("cell").reset_index(drop=True)


def test_tile_image_rollup_matches_brute_force(spark):
    pdf = IM.synth_geo_frames_pdf(48, 32)
    got = (tiles.tile_image_rollup(spark.createDataFrame(pdf),
                                   res=8, salt_n=16)
           .toPandas().sort_values("cell").reset_index(drop=True))
    want = _brute_rollup(pdf)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)


def test_geo_frames_plant_a_hot_cell(spark):
    pdf = IM.synth_geo_frames_pdf(48, 32)
    frames = tiles.assign_tiles(spark.createDataFrame(pdf), res=8)
    share = skew.top_key_share(frames, "cell")
    # 60% of trajectories are clipped inside one res-8 downtown tile
    assert share >= 0.55
    # and the fixture still covers a real tail of other cells
    assert frames.select("cell").distinct().count() > 10


def test_geo_frames_reach_negative_phash():
    pdf = IM.synth_geo_frames_pdf(48, 32)
    assert (pdf["phash"] < 0).any(), \
        "fixture must exercise the unsigned scene shift on negative int64"


def test_caption_consistency_matches_brute_force(spark):
    pdf = IM.synth_caption_reuse_pdf(512)
    got = (datapipe.caption_consistency(
               spark.createDataFrame(pdf, schema=IM.IMAGES_SCHEMA))
           .toPandas().sort_values("image_id").reset_index(drop=True))
    cap = pdf.groupby("caption").agg(
        caption_images=("image_id", "count"),
        caption_scenes=("phash", "nunique"))
    ph = pdf.groupby("phash").agg(phash_captions=("caption", "nunique"))
    want = pdf[["image_id", "caption", "phash"]] \
        .join(cap, on="caption").join(ph, on="phash")
    want["is_spam_caption"] = ((want["caption_images"] >= 3)
                               & (want["caption_scenes"] >= 3))
    want["is_conflict"] = want["phash_captions"] > 1
    want = (want.drop(columns=["caption", "phash"])
            .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)


def test_caption_consistency_flags_planted_failures(spark):
    pdf = IM.synth_caption_reuse_pdf(512)
    got = (datapipe.caption_consistency(
               spark.createDataFrame(pdf, schema=IM.IMAGES_SCHEMA))
           .toPandas().set_index("image_id"))
    # every boilerplate caption spans dozens of distinct images -> spam
    boiler_ids = pdf.loc[pdf["caption"].isin(IM._BOILERPLATE_CAPTIONS),
                         "image_id"]
    assert len(boiler_ids) > 50
    assert got.loc[boiler_ids, "is_spam_caption"].all()
    # a copied image keeping its own caption -> conflict on both copies
    donor, copy = pdf.iloc[4], pdf.iloc[5]
    assert copy["phash"] == donor["phash"] \
        and copy["caption"] != donor["caption"]
    assert got.loc[copy["image_id"], "is_conflict"]
    assert got.loc[donor["image_id"], "is_conflict"]
    # unique well-formed rows are untouched
    assert not got["is_spam_caption"].all()
    assert not got["is_conflict"].all()
