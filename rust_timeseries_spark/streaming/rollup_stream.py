"""Structured Streaming variants of the rollup pipeline.

The batch engine (operators/rollup.py + plans/tiers.py) is the v0
materialization path; this module provides the streaming equivalents
(SURVEY.md §2.9):

* ``stream_rollup`` — ``readStream`` file source → event-time watermark
  → tumbling-window aggregate. Watermarking bounds state: buckets older
  than the watermark are finalized and dropped from the state store.
* ``run_incremental`` — micro-batch (``availableNow``) execution with a
  ``foreachBatch`` MERGE into the tier store: each micro-batch's
  touched buckets are recomputed idempotently, giving exactly-once tier
  maintenance on top of at-least-once file ingestion; late rows simply
  re-dirty their bucket (same semantics as the batch pipeline).

The aggregate set matches the batch tiers exactly (sum/count/min/max
compose), so a tier can be served from either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import TIERS, epoch_seconds


def stream_rollup(
    spark: SparkSession,
    input_path: str,
    schema,
    tier: str = "1m",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
    watermark: str = "10 minutes",
    glob: str | None = None,
    reader_options: dict[str, str] | None = None,
    epoch: bool = False,
) -> DataFrame:
    """Streaming tumbling rollup with late-data watermark. The file
    source requires a DIRECTORY: to stream a single file living among
    others, pass its parent as ``input_path`` and the filename as
    ``glob`` (mapped to ``pathGlobFilter``). ``reader_options`` passes
    extra file-source options (e.g. ``maxFilesPerTrigger`` to force a
    multi-micro-batch replay of a backlog).

    ``epoch=True`` emits ``bucket_ts`` as an epoch-second BIGINT — the
    batch ``TierStore``/``rollup_raw(epoch=True)`` key convention — so a
    ``foreachBatch`` merge_fn can upsert into an epoch-keyed tier table
    directly (review r4: with the default timestamp ``bucket_ts``, a
    merge keyed against an epoch-bigint tier would join timestamp vs
    long and never match)."""
    keys = keys if keys is not None else ["source"]
    width = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    reader = spark.readStream.schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(input_path)
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        # watermarks require TIMESTAMP (LTZ). Convert TZ-independently:
        # NTZ is UTC wall-clock by engine convention, so go NTZ → epoch
        # seconds (the batch path's own epoch_seconds — one shared
        # definition keeps stream ≡ batch) → LTZ instant (a
        # long→timestamp cast is session-TZ-independent, unlike a
        # direct NTZ→LTZ cast)
        es = epoch_seconds(F.col(ts_col), "timestamp_ntz")
        stream = stream.withColumn(ts_col, es.cast("timestamp"))
    v = F.col(value_col)
    bucket = F.col("win.start")
    if epoch:
        bucket = epoch_seconds(bucket, "timestamp")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, width).alias("win"))
        .agg(
            F.sum(v).alias("tok_sum"),
            F.count(v).alias("tok_count"),
            F.min(v).alias("tok_min"),
            F.max(v).alias("tok_max"),
        )
        .select(*keys, bucket.alias("bucket_ts"), "tok_sum", "tok_count", "tok_min", "tok_max")
    )


def run_incremental(
    agg_stream: DataFrame,
    checkpoint_dir: str,
    merge_fn,
    trigger_available_now: bool = True,
):
    """Drive the streaming aggregate with foreachBatch(merge_fn) —
    ``merge_fn(batch_df, batch_id)`` receives finalized/updated buckets
    and MERGEs them into the tier table (plans/tiers.py semantics).
    ``availableNow`` processes the current backlog and stops: the
    incremental-batch mode the engine uses for tier maintenance."""
    writer = (
        agg_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_fn)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tier_names() -> list[str]:
    return sorted(TIERS)


def stream_session_rollup(
    spark: SparkSession,
    input_path: str,
    schema,
    gap: str = "5 minutes",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
    watermark: str = "0 seconds",
    glob: str | None = None,
    reader_options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming SESSION-window rollup (``F.session_window`` under a
    watermark — SURVEY §2.9's merging-window stateful aggregate).
    Sessions are emitted in APPEND mode only once the watermark passes
    ``session_end`` (complete mode is unsupported for merging windows);
    a session is therefore finalized by a LATER batch whose data
    advances the watermark past it. Drivers replaying a static backlog
    must append watermark-advancing sentinel batches to flush the tail
    — see the ``streaming_sessions`` driver gate for the 2-sentinel
    recipe (sentinels' own sessions stay open and are never emitted, so
    no filtering is needed).

    Same NTZ→epoch→LTZ timestamp bridge as ``stream_rollup``; the
    aggregate set matches ``operators/rollup.py:session_rollup`` so
    stream ≡ batch is checkable against the identical oracle."""
    keys = keys if keys is not None else ["source"]
    reader = spark.readStream.schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(input_path)
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        # MICROSECOND-exact NTZ→LTZ bridge (timestamp_micros of the
        # decimal-seconds interval) — the tumbling bridge's floor-to-
        # seconds would corrupt gap decisions: session merging is
        # sub-second-sensitive (two events 4m59.8s apart floor to a
        # 5m00s difference and would wrongly SPLIT under a 5m gap).
        # timestamp_micros builds the LTZ instant from a long —
        # session-TZ-independent, unlike a direct NTZ→LTZ cast.
        us = (
            F.expr(
                f"cast((cast({ts_col} as timestamp_ntz)"
                " - timestamp_ntz'1970-01-01 00:00:00') as decimal(20,6))"
            )
            * F.lit(1000000)
        ).cast("long")
        stream = stream.withColumn(ts_col, F.timestamp_micros(us))
    v = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("win"))
        .agg(F.sum(v).alias("tok_sum"), F.count(v).alias("tok_count"))
        .select(
            *keys,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "tok_sum",
            "tok_count",
        )
    )
