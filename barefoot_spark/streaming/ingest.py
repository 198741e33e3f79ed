"""Streaming ingest front-end for the image+caption table.

The batch dedup operators (operators/datapipe.py) assume the corpus is
at rest; this is the arrival-time half a 100-TB pipeline needs: as
image records stream in, drop re-uploads (same content key) with
STATE BOUNDED BY THE WATERMARK — `dropDuplicatesWithinWatermark` keeps
a key in the state store only until the event-time watermark passes
it, so state size tracks ingest-rate x delay instead of corpus size
(an unbounded `dropDuplicates` state would itself become a 10^12-key
table). Stateless gates run BEFORE the dedup so junk rows never touch
the state store.

Reference analog: the tracker's ingest path drops out-of-order and
duplicate-time samples before state updates
(tracker/TrackerServer.java:152-258); here the same discipline is
applied to the image table's content keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ingest_images_stream(images: DataFrame, time_col: str = "ts",
                         delay: str = "10 minutes",
                         dedup_keys=("phash",),
                         min_caption_len: int = 0) -> DataFrame:
    """Streaming image ingest: quality gate -> event-time watermark ->
    first-arrival exact dedup on `dedup_keys` with watermark-bounded
    state. Works identically on a batch DataFrame (watermark is a
    no-op there), so the same code path serves backfill and live
    ingest.

    dedup_keys defaults to the content key the input_hint schema
    already carries (phash); pass ("phash", "caption") for joint
    image+caption identity, or a content hash column for byte-exact
    identity."""
    out = images
    if min_caption_len > 0:
        out = out.filter(F.length(F.col("caption")) >= min_caption_len)
    out = out.withWatermark(time_col, delay)
    if out.isStreaming:
        return out.dropDuplicatesWithinWatermark(list(dedup_keys))
    return out.dropDuplicates(list(dedup_keys))
