"""Time-series joins Spark lacks as built-ins, composed from shuffle-
friendly primitives: as-of (backward) join and point-in-interval join.

Reference scope note: the reference engine's join surface is lag
pairing and dimension joins (SURVEY §2.3, J1–J3); as-of and interval
joins are the two enrichment joins every production time-series /
training-data pipeline adds on top (trade-quote style enrichment;
event-to-maintenance-window attribution). Both are implemented as
compositions of existing DataFrame ops — no UDF, no cartesian, no
inequality-join fallback to BroadcastNestedLoopJoin:

* ``asof_join``: the union + ordered-window trick. Tag right rows,
  union with left rows, one window sorted by (time, side) per key
  carries the latest right row forward (``last_value IGNORE NULLS``),
  then keep left rows. Cost = ONE shuffle on the key + an in-partition
  sort — the same shape as a sort-merge join, at any scale. An
  optional ``tolerance`` nulls matches older than ``t − tolerance``
  (the latest match is the closest one, so filtering it IS the
  tolerance semantics).
* ``interval_join``: bounded-replication bucket join. Intervals are
  exploded to the fixed-width buckets they overlap, points map to
  exactly one bucket, and an equi-join on (key, bucket) + an exact
  range refine replaces the cartesian a naive ``t BETWEEN s AND e``
  join would plan. Replication factor per interval is
  ``len/bucket_width + 2`` — pick ``bucket_width`` near the typical
  interval length (the caller knows its data; the default derives it
  from the intervals with one tiny agg job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "t",
    right_ts: str = "t",
    tolerance: int | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the single right row with the largest
    ``right_ts`` ≤ ``left_ts`` within the same key (inclusive at
    equality; ``direction='forward'`` mirrors to smallest ≥). Left rows
    without a qualifying right row keep nulls. Timestamps must be
    numeric (epoch) or naturally ordered types; right (key, ts) pairs
    should be unique — with duplicates, the row latest in the sort wins
    (documented, deterministic only up to that tie).

    Executes as: union of tagged inputs → one hash Exchange on ``keys``
    → in-partition sort → window carry — no nested-loop join at any
    input size.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # reserved-name guard: the construction owns _ts/_is_right/_rrow
    # (review r5 — a silent collision would corrupt the union schema)
    reserved = {"_ts", "_is_right", "_rrow"}
    bad = sorted(reserved & (set(left.columns) | set(right.columns)))
    if bad:
        raise ValueError(f"input columns collide with asof_join internals: {bad}")
    value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(value_cols) & set(left.columns)
    out_names = {c: (c + suffix if c in clash else c) for c in value_cols}
    # chaining guard (review r5): a left input that already carries a
    # matched_ts from a previous asof_join gets the suffixed name
    # instead of an ambiguous duplicate
    mt_name = "matched_ts" + suffix if "matched_ts" in left.columns else "matched_ts"

    # right rows with a null timestamp can never be the latest match —
    # drop them up front (they would otherwise sort first and pollute
    # the carry struct)
    r_tagged = right.where(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    l_tagged = left.select(
        "*", F.col(left_ts).alias("_ts"), F.lit(0).alias("_is_right")
    )
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_rv_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    # align schemas explicitly: (keys, _ts, _is_right, left cols..., _rv cols...)
    lefts_minus = [c for c in left.columns if c not in keys]
    r_full = r_tagged
    for c in lefts_minus:
        r_full = r_full.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [*keys, "_ts", "_is_right", *lefts_minus, *[f"_rv_{c}" for c in value_cols]]
    both = r_full.select(*cols).unionByName(l_tagged.select(*cols))

    # the matched right row is carried as ONE struct (review r5): with
    # per-column last(ignorenulls), a matched right row holding a NULL
    # value column would fall through to a STALE earlier row's value —
    # the struct is non-null exactly for right rows, so nulls inside it
    # travel with their own row
    both = both.withColumn(
        "_rrow",
        F.when(
            F.col("_is_right") == 1,
            F.struct(
                F.col("_ts").alias("ts"),
                *[F.col(f"_rv_{c}").alias(c) for c in value_cols],
            ),
        ),
    )

    # right rows sort BEFORE left rows at equal time (backward join is
    # inclusive); forward mirrors by negating the time
    order_ts = F.col("_ts") if direction == "backward" else (-F.col("_ts"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_ts.asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *cols,
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
    ).where(F.col("_is_right") == 0)

    matched_ts = F.col("_m.ts")
    if tolerance is not None:
        gap = (
            F.col("_ts") - matched_ts
            if direction == "backward"
            else matched_ts - F.col("_ts")
        )
        ok = matched_ts.isNotNull() & (gap <= F.lit(tolerance))
        return carried.select(
            *keys, *lefts_minus,
            F.when(ok, matched_ts).alias(mt_name),
            *[F.when(ok, F.col(f"_m.{c}")).alias(out_names[c]) for c in value_cols],
        )
    return carried.select(
        *keys, *lefts_minus,
        matched_ts.alias(mt_name),
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "t",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """All (point, interval) pairs with ``start ≤ t < end`` (or ≤ end)
    within the same key — WITHOUT an inequality join: intervals explode
    to the fixed-width time buckets they overlap (bounded replication),
    points hash to exactly one bucket, then equi-join + exact refine.
    Returns the point columns + the interval's columns.

    ``bucket_width`` defaults to the max interval length (one tiny agg
    job — constant driver cost), capping replication at 2 rows per
    interval. Overlapping intervals are fine: a point matches each
    interval covering it exactly once (the join key is the point's own
    bucket, which appears once per covering interval)."""
    ivl_cols = [c for c in intervals.columns if c not in keys]
    clash = set(ivl_cols) & set(points.columns)
    if clash:
        raise ValueError(f"interval columns clash with point columns: {sorted(clash)}")
    if bucket_width is None:
        mx = intervals.agg(
            F.max(F.col(end_col) - F.col(start_col)).alias("mx")
        ).collect()[0]["mx"]
        bucket_width = max(1, int(mx or 1))
    wlit = F.lit(int(bucket_width))

    # clamp: a zero-length interval (end == start, exclusive) or an
    # inverted one (bad data) must NOT produce a descending sequence —
    # Spark's sequence(b, b-1) runs BACKWARD, exploding spurious bucket
    # rows (review r5; output stayed correct via the refine, but the
    # replication was unbounded for inverted intervals)
    last_in = F.col(end_col) if end_inclusive else (F.col(end_col) - 1)
    last_in = F.greatest(last_in, F.col(start_col))
    ivl_b = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / wlit),
                F.floor(last_in / wlit),
            )
        ),
    )
    pts_b = points.withColumn("_b", F.floor(F.col(point_ts) / wlit))
    joined = pts_b.join(ivl_b, [*keys, "_b"])
    upper = (
        F.col(point_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(point_ts) < F.col(end_col)
    )
    refine = (F.col(point_ts) >= F.col(start_col)) & upper
    return joined.where(refine).drop("_b")
