"""Streaming exact deduplication — ``dropDuplicatesWithinWatermark``
over a keyed event stream (§2.9 streaming surface × the pipeline's
dedup dimension).

Semantics (the public Structured Streaming contract, probed by
tests/test_streaming.py::test_dedup_stream_watermark_eviction): the
first row per key set is emitted; a duplicate is dropped EITHER by
live state (within ``delay`` of the first row) OR by the stateful
operator's late filter (its event time is behind the watermark) —
with identical event times those two windows meet, so a same-time
duplicate is always dropped. The at-least-once boundary is a
duplicate carrying a NEWER event time that arrives after its key's
state was evicted: it re-emits. (Exactly-once dedup with bounded
state is impossible over an unbounded key space; the batch
``dedup_exact`` path is the full-history tool.) The driver gate runs
with a delay spanning the whole replay (state never evicts ⇒ result ≡
batch DISTINCT, oracle-checked); the eviction boundary is pinned by
the targeted pytest instead.

Watermarks need a TIMESTAMP column: callers with epoch-bigint event
time pass it through ``timestamp_seconds`` (the engine's NTZ parquet
gotcha — never a direct cast)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "1 hour",
    epoch_seconds_col: bool = False,
) -> DataFrame:
    """Drop duplicate rows by ``keys`` within the watermark window.

    ``epoch_seconds_col=True`` converts an epoch-bigint ``ts_col`` into
    the TIMESTAMP column the watermark machinery requires (added as
    ``_wm_ts`` and dropped from the output)."""
    df = stream_df
    wm_col = ts_col
    if epoch_seconds_col:
        df = df.withColumn("_wm_ts", F.timestamp_seconds(F.col(ts_col)))
        wm_col = "_wm_ts"
    out = df.withWatermark(wm_col, delay).dropDuplicatesWithinWatermark(keys)
    return out.drop("_wm_ts") if epoch_seconds_col else out
