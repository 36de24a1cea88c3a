"""Gap-fill: dense calendar spine + LOCF / linear interpolation.

North-rule operator (SURVEY.md W12/J3). A tier table only has rows for
buckets that saw data; gap-fill densifies each key's bucket series:

1. Build a per-key spine: ``sequence(min_bucket, max_bucket, step)`` +
   ``explode`` — generated from the (tiny) per-key min/max aggregate,
   never from raw data.
2. Left-join observed buckets onto the spine. The spine and tier table
   are both keyed (source, bucket_ts); AQE picks broadcast when the
   spine is small, otherwise a shuffled join that reuses the tier's
   existing hash partitioning.
3. Fill: LOCF via ``last(v, ignorenulls=True)`` over a running window
   (single pass, no UDF); linear interpolation via the prev/next anchor
   trick — still pure column expressions, no Python in the path.

Boundary semantics mirror the reference's pre-sample seeding
(``extract_init`` — reference src/duration/core/psi.rs:403-427): leading
gaps have no prior observation, so LOCF leaves them null unless the
caller seeds ``init_value`` per key (the Init::Fixed / FixedVector
analogue, reference src/duration/core/init.rs:132-145).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STEP = {"1m": "INTERVAL 1 MINUTE", "1h": "INTERVAL 1 HOUR", "1d": "INTERVAL 1 DAY"}
_STEP_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def spine(tier_df: DataFrame, tier: str, keys: list[str] | None = None) -> DataFrame:
    """Dense (keys, bucket_ts) spine spanning each key's observed range.

    Works for both bucket encodings: timestamp buckets step by calendar
    interval, epoch-second long buckets step by integer width.
    """
    keys = keys if keys is not None else ["source"]
    is_epoch = dict(tier_df.dtypes)["bucket_ts"] in ("bigint", "int", "long")
    step = F.lit(_STEP_SECONDS[tier]) if is_epoch else F.expr(_STEP[tier])
    bounds = tier_df.groupBy(*keys).agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    return bounds.select(
        *keys,
        F.explode(F.sequence("_lo", "_hi", step)).alias("bucket_ts"),
    )


def densify(tier_df: DataFrame, tier: str, keys: list[str] | None = None) -> DataFrame:
    """Left-join the tier onto its dense spine; missing buckets become
    null-valued rows (tok_count filled with 0 — a bucket with no data has
    an exact count)."""
    keys = keys if keys is not None else ["source"]
    sp = spine(tier_df, tier, keys)
    out = sp.join(tier_df, [*keys, "bucket_ts"], "left")
    if "tok_count" in out.columns:
        out = out.withColumn("tok_count", F.coalesce("tok_count", F.lit(0)))
    return out


def locf(
    dense_df: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Last-observation-carried-forward over each key's bucket series.

    One running window per key (rowsBetween unbounded-preceding..current)
    — evaluated in a single sort per partition group; no shuffle beyond
    the partitionBy exchange, which matches the tier's layout.
    """
    keys = keys if keys is not None else ["source"]
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    out = dense_df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    dense_df: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Linear interpolation across gaps, fully in column expressions.

    For each null run, anchor on the previous and next non-null
    observation and their bucket timestamps; interpolate proportionally
    to time distance. Leading/trailing gaps (one-sided anchors) fall back
    to the available anchor (LOCF forward / NOCB backward).
    """
    keys = keys if keys is not None else ["source"]
    wb = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(0, Window.unboundedFollowing)
    if dict(dense_df.dtypes)[order_col] in ("bigint", "int", "long", "double"):
        ts_long = F.col(order_col).cast("double")
    else:
        ts_long = F.unix_timestamp(F.col(order_col)).cast("double")
    out = dense_df
    for c in value_cols:
        prev_v = F.last(c, ignorenulls=True).over(wb)
        next_v = F.first(c, ignorenulls=True).over(wf)
        prev_t = F.last(F.when(F.col(c).isNotNull(), ts_long), ignorenulls=True).over(wb)
        next_t = F.first(F.when(F.col(c).isNotNull(), ts_long), ignorenulls=True).over(wf)
        frac = (ts_long - prev_t) / (next_t - prev_t)
        interp = prev_v + (next_v - prev_v) * frac
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
            .when(prev_v.isNull(), next_v.cast("double"))
            .when(next_v.isNull(), prev_v.cast("double"))
            .otherwise(interp),
        )
    return out
