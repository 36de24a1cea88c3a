"""User-journey analytics over event streams: funnel conversion,
cohort retention, and event-transition matrices.

The three classic product-analytics rollups a training-data / telemetry
pipeline runs at web scale, expressed so every stage is a hash
aggregate or an equi-join on ``user_id`` (never a self-cartesian and
never a driver-side collect):

* **Funnel**: per-user earliest completion of an ordered step list
  within a time budget — one ``min`` aggregate per step plus one
  equi-join per step transition (each join keyed on ``user_id``, so at
  scale all of them co-locate under a single shuffle of the user
  dimension).
* **Cohort retention**: first-seen bucket per user, then distinct
  users per (cohort, offset) — two hash aggregates + one equi-join.
* **Transitions**: per-user ordered ``lead`` pairing (one window sort
  per user) → (from, to) counts — the Markov transition audit.

Epoch bucket math mirrors ``rollup.bucket_col(epoch=True)`` — integer
arithmetic, timezone-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_SECONDS, epoch_seconds


def _es(df: DataFrame, ts_col: str) -> "F.Column":
    return epoch_seconds(F.col(ts_col), dict(df.dtypes)[ts_col])


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    within: int,
    step_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tier: str = "1d",
) -> DataFrame:
    """Ordered-funnel completion per start bucket: for each user, the
    earliest ``steps[0]`` event anchors the funnel; each later step
    must occur strictly AFTER the previous step's chosen time and
    within ``within`` seconds of the ANCHOR. Per step k the chosen
    time is the earliest qualifying occurrence (the standard
    first-touch funnel definition — deterministic, no tie ambiguity
    because times are compared as epoch seconds and equal-time events
    do not advance the funnel).

    Returns one row per start bucket: ``n_step1, n_step2, ...`` user
    counts plus ``conv_rate`` (last/first, 4dp).

    Scale shape: |steps| min-aggregates (two-phase, map-side combine)
    chained by |steps|−1 equi-joins on ``user_col``; every join key is
    the same, so a cluster co-partitions all of them under one user
    shuffle. Nothing is data-proportional on the driver."""
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps, got {steps}")
    if within <= 0:
        raise ValueError(f"within must be > 0 seconds, got {within}")
    es = _es(df, ts_col)
    base = df.select(
        F.col(user_col).alias("_u"), F.col(step_col).alias("_s"), es.alias("_t")
    )
    # anchor: earliest step-0 per user
    cur = (
        base.where(F.col("_s") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_t0"))
        .withColumn("_tprev", F.col("_t0"))
    )
    reached = [cur.select("_u", "_t0")]
    for step in steps[1:]:
        nxt = base.where(F.col("_s") == step).select("_u", F.col("_t").alias("_tn"))
        cur = (
            cur.join(nxt, "_u")
            .where(
                (F.col("_tn") > F.col("_tprev"))
                & (F.col("_tn") <= F.col("_t0") + F.lit(within))
            )
            .groupBy("_u", "_t0")
            .agg(F.min("_tn").alias("_tprev"))
        )
        reached.append(cur.select("_u", "_t0"))
    width = TIER_SECONDS[tier]
    bucket = lambda d: d.withColumn(  # noqa: E731
        "bucket_ts", F.col("_t0") - F.pmod(F.col("_t0"), F.lit(width))
    )
    out = None
    for k, r in enumerate(reached, start=1):
        # each reached[k] frame is one row per user BY CONSTRUCTION
        # (its groupBy key is _u), so a plain count suffices — a
        # countDistinct here planned a needless expand+extra exchange
        agg = (
            bucket(r)
            .groupBy("bucket_ts")
            .agg(F.count(F.lit(1)).cast("long").alias(f"n_step{k}"))
        )
        out = agg if out is None else out.join(agg, "bucket_ts", "left")
    last = f"n_step{len(steps)}"
    return out.select(
        "bucket_ts",
        *[
            F.coalesce(F.col(f"n_step{k}"), F.lit(0)).cast("long").alias(f"n_step{k}")
            for k in range(1, len(steps) + 1)
        ],
        F.round(
            F.coalesce(F.col(last), F.lit(0)).cast("double") / F.col("n_step1"), 4
        ).alias("conv_rate"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tier: str = "1d",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: cohort = the user's first-seen bucket;
    one row per (cohort_ts, offset) with the distinct users active
    ``offset`` buckets after their cohort bucket (offset 0 = the cohort
    size). ``max_offset`` truncates the tail.

    Two hash aggregates + one equi-join on ``user_col`` — the join is a
    shuffle join on the user dimension (not broadcastable at 10⁹
    users), co-partitioned with the first aggregate's output."""
    width = TIER_SECONDS[tier]
    es = _es(df, ts_col)
    ev = df.select(
        F.col(user_col).alias("_u"),
        (es - F.pmod(es, F.lit(width))).alias("_b"),
    )
    cohorts = ev.groupBy("_u").agg(F.min("_b").alias("cohort_ts"))
    j = ev.join(cohorts, "_u").withColumn(
        "offset", ((F.col("_b") - F.col("cohort_ts")) / F.lit(width)).cast("long")
    )
    if max_offset is not None:
        j = j.where(F.col("offset") <= max_offset)
    return (
        j.groupBy("cohort_ts", "offset")
        .agg(F.countDistinct("_u").alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    step_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-transition (Markov) matrix: order each user's
    events by ``(epoch, id_col)`` — the id tie-break makes equal-time
    ordering deterministic on every engine — pair each event with its
    successor via ``lead``, count per (from_event, to_event) and add
    the per-from share (4dp). Terminal events (no successor) are
    dropped.

    One window sort per user + one two-phase hash aggregate."""
    es = _es(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(es.asc(), F.col(id_col).asc())
    pairs = (
        df.select(
            F.col(step_col).alias("from_event"),
            F.lead(step_col, 1).over(w).alias("to_event"),
        )
        .where(F.col("to_event").isNotNull())
    )
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wtot = Window.partitionBy("from_event")
    return counts.withColumn(
        "share", F.round(F.col("n").cast("double") / F.sum("n").over(wtot), 4)
    )


def ab_test_zstat(
    user_conv: DataFrame,
    user_col: str = "user_id",
    conv_col: str = "conv",
    n_variants: int = 2,
) -> DataFrame:
    """Two-proportion A/B z-test with DETERMINISTIC hash assignment:
    variant = ``stable_hash32(user) % n_variants`` (the same user lands
    in the same arm on every engine/run — the engine's stable-split
    primitive). Input is ONE ROW PER USER with a 0/1 ``conv_col``
    (derive it upstream however the experiment defines conversion).
    Emits one row per variant pair (A=i, B=j, i<j) with exact counts
    and the pooled two-proportion z statistic

        z = (p_i − p_j) / √(p̄(1−p̄)(1/n_i + 1/n_j))

    Every input to z is an exact integer, so the float pipeline is the
    same short chain of IEEE ops on both engines — z is bit-identical,
    not merely %.5e-close. z is NULL when the pooled rate is degenerate
    (p̄ ∈ {0, 1} ⇒ se = 0 — everyone or no one converted).

    Plan: one two-phase user aggregate, one tiny k-row variant
    aggregate, then a k² broadcast self-join (k = n_variants, constant
    — the only non-linear stage is over a constant-size table)."""
    from .sampling import stable_hash32

    users = user_conv.select(
        F.pmod(stable_hash32(user_col), F.lit(n_variants)).cast("int").alias("variant"),
        F.col(conv_col).cast("int").alias("_conv"),
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("_conv").cast("long").alias("n_conv"),
    )
    a = arms.select(
        F.col("variant").alias("variant_a"),
        F.col("n_users").alias("n_a"),
        F.col("n_conv").alias("conv_a"),
    )
    b = arms.select(
        F.col("variant").alias("variant_b"),
        F.col("n_users").alias("n_b"),
        F.col("n_conv").alias("conv_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("variant_a") < F.col("variant_b"))
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    return pairs.select(
        "variant_a", "variant_b", "n_a", "conv_a", "n_b", "conv_b",
        F.when(var > 0, (pa - pb) / F.sqrt(var)).alias("z_stat"),
    )
