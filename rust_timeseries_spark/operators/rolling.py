"""Rolling-window statistics and lagged moment statistics.

Two families, both over a key's time-ordered bucket series:

* **Trailing rolling stats** (north-rule W11): mean/min/max/std/sum over
  the trailing k buckets — native Spark window frames, whole-stage
  codegen, one sort per key group.

* **Lagged moments** (reference semantics, SURVEY.md W6/W7/J1):
  unbiased lag-j autocovariance γ̂_j and the heteroskedasticity proxy
  τ̂_j with the reference's exact ``1/(n−j)`` denominators and
  full-series mean —
    γ̂_j = (1/(n−j)) Σ_{t≥j} (Y_t−Ȳ)(Y_{t−j}−Ȳ)
      (reference src/statistical_tests/escanciano_lobato.rs:369-378)
    τ̂_j = (1/(n−j)) Σ_{t≥j} (Y_t−Ȳ)²(Y_{t−j}−Ȳ)²
      (reference escanciano_lobato.rs:322-331)
  The lag-j pairing (`data[j..].zip(data)` — escanciano_lobato.rs:325-330)
  is ``F.lag(v, j)`` over the key's sorted window: an index-offset
  self-join executed without any extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_stats(
    df: DataFrame,
    value_col: str,
    k: int,
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Trailing-k rolling mean/min/max/sum/std per key (frame = k rows
    ending at current; partial frames at the series head use however many
    rows exist, matching SQL window-frame semantics)."""
    keys = keys if keys is not None else ["source"]
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(-(k - 1), 0)
    v = F.col(value_col)
    return (
        df.withColumn("roll_mean", F.avg(v).over(w))
        .withColumn("roll_min", F.min(v).over(w))
        .withColumn("roll_max", F.max(v).over(w))
        .withColumn("roll_sum", F.sum(v).over(w))
        .withColumn("roll_std", F.stddev_samp(v).over(w))
        .withColumn("roll_count", F.count(v).over(w))
    )


def anomaly_zscore(
    df: DataFrame,
    value_col: str,
    k: int,
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
    z_thresh: float = 3.0,
    min_points: int = 12,
) -> DataFrame:
    """Trailing-window z-score anomaly flags per key: each bucket is
    scored against the mean/std of the PRECEDING ``k`` buckets (frame
    ``[-k, -1]`` — the current point never contaminates its own
    baseline, the standard online-monitoring convention). ``z`` is null
    until ``min_points`` history exists or while the trailing std is 0
    (constant history ⇒ no scale); ``is_anomaly`` is 1 when
    ``|z| > z_thresh``.

    One window sort per key — the same single-Exchange plan shape as
    ``rolling_stats``; mean is computed as exact-int ``sum/count``
    (not ``avg``) so integer inputs score identically on any engine.
    """
    keys = keys if keys is not None else ["source"]
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(-k, -1)
    v = F.col(value_col)
    cnt = F.count(v).over(w)
    mean = F.sum(v).over(w).cast("double") / cnt
    std = F.stddev_samp(v).over(w)
    ok = (cnt >= min_points) & std.isNotNull() & (std > 0)
    z = F.when(ok, (v.cast("double") - mean) / std)
    return (
        df.withColumn("trail_count", cnt)
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.when(ok & (F.abs(z) > z_thresh), F.lit(1)).otherwise(F.lit(0)).cast("int"),
        )
    )


def lag_moments(
    df: DataFrame,
    value_col: str,
    max_lag: int,
    keys: list[str] | None = None,
    order_col: str = "t",
) -> DataFrame:
    """Per-key γ̂_j and τ̂_j for j = 1..max_lag, plus ρ̃_j² = γ̂_j²/τ̂_j
    (reference escanciano_lobato.rs:468-479). Output: one row per
    (key, lag).

    Plan shape: ONE window sort per key computes every lag column in a
    single pass; the per-key mean is a tiny broadcast-joined aggregate;
    an explode turns (row × lag) pairs into rows; one final hash
    aggregate over (key, lag). No Python anywhere.
    """
    keys = keys if keys is not None else ["key"]
    v = F.col(value_col)
    means = df.groupBy(*keys).agg(F.avg(v).alias("_ybar"), F.count(v).alias("_n"))
    joined = df.join(F.broadcast(means), keys)
    w = Window.partitionBy(*keys).orderBy(order_col)
    dev = v - F.col("_ybar")
    # all lag deviations in one Window operator
    lagged = joined.select(
        *keys,
        "_n",
        dev.alias("_dev"),
        *[(F.lag(v, j).over(w) - F.col("_ybar")).alias(f"_lagdev{j}") for j in range(1, max_lag + 1)],
    )
    pairs = lagged.select(
        *keys,
        "_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("lag"),
                        (F.col("_dev") * F.col(f"_lagdev{j}")).alias("g"),
                        (F.col("_dev") * F.col("_dev") * F.col(f"_lagdev{j}") * F.col(f"_lagdev{j}")).alias("tau"),
                    )
                    for j in range(1, max_lag + 1)
                ]
            )
        ).alias("_p"),
    ).select(*keys, "_n", F.col("_p.lag").alias("lag"), F.col("_p.g").alias("_g"), F.col("_p.tau").alias("_tau"))
    return (
        pairs.groupBy(*keys, "lag")
        .agg(
            (F.sum("_g") / (F.first("_n") - F.col("lag"))).alias("gamma_j"),
            (F.sum("_tau") / (F.first("_n") - F.col("lag"))).alias("tau_j"),
        )
        .withColumn("rho_tilde_sq", (F.col("gamma_j") ** 2) / F.col("tau_j"))
    )


def cross_correlation(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str = "tok_sum",
    max_lag: int = 5,
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Lagged cross-correlation between two bucket series (the
    two-series companion of ``lag_moments``, reference
    escanciano_lobato.rs lag conventions): align ``a`` and ``b`` on
    ``(keys, order_col)`` (inner join — overlap only), then for
    j = 0..max_lag

        r_j = Σ_{t≥j} (a_t − ā)(b_{t−j} − b̄) / ((n−j)·σ̂_a·σ̂_b)

    with ā, b̄, σ̂ (population, 1/n) over the ALIGNED overlap and the
    reference's exact ``1/(n−j)`` pair denominators. ``b`` leads:
    positive j correlates today's ``a`` with ``b`` j buckets earlier.

    Plan: one equi-join on (keys, bucket) — sort-merge at scale, both
    sides pre-partitioned by key in a tier pipeline — a tiny broadcast
    moments join, ONE window sort producing every lag column, explode,
    final hash aggregate. No Python in the row path."""
    keys = keys if keys is not None else ["key"]
    drop_key = not keys
    if drop_key:  # single global series pair: constant internal key.
        # NOTE: Catalyst constant-folds this key, so the 1-row moments
        # attach plans as a broadcast nested-loop — a scalar broadcast,
        # safe at any scale; the keyed path plans a BroadcastHashJoin
        # (plan check 30).
        keys = ["_ck"]
        df_a = df_a.withColumn("_ck", F.lit(1))
        df_b = df_b.withColumn("_ck", F.lit(1))
    a = df_a.select(*keys, order_col, F.col(value_col).cast("double").alias("_a"))
    b = df_b.select(*keys, order_col, F.col(value_col).cast("double").alias("_b"))
    j = a.join(b, [*keys, order_col])
    moms = j.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_a").alias("_abar"),
        F.avg("_b").alias("_bbar"),
        F.stddev_pop("_a").alias("_sa"),
        F.stddev_pop("_b").alias("_sb"),
    )
    w = Window.partitionBy(*keys).orderBy(order_col)
    da = F.col("_a") - F.col("_abar")
    lagged = j.join(F.broadcast(moms), keys).select(
        *keys,
        "_n", "_sa", "_sb",
        da.alias("_da"),
        *[
            (F.lag("_b", jj).over(w) - F.col("_bbar")).alias(f"_db{jj}")
            for jj in range(0, max_lag + 1)
        ],
    )
    pairs = lagged.select(
        *keys,
        "_n", "_sa", "_sb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(jj).alias("lag"),
                        (F.col("_da") * F.col(f"_db{jj}")).alias("g"),
                    )
                    for jj in range(0, max_lag + 1)
                ]
            )
        ).alias("_p"),
    ).select(*keys, "_n", "_sa", "_sb", F.col("_p.lag").alias("lag"), F.col("_p.g").alias("_g"))
    n_pairs = (F.first("_n") - F.col("lag")).cast("long")
    denom = (F.first("_n") - F.col("lag")) * F.first("_sa") * F.first("_sb")
    out = pairs.groupBy(*keys, "lag").agg(
        n_pairs.alias("n_pairs"),
        # degenerate overlaps (constant series: sa/sb = 0; or lag >= n:
        # zero pairs) yield NULL instead of an ANSI DIVIDE_BY_ZERO abort
        F.when(denom > 0, F.sum("_g") / denom).alias("ccf"),
    )
    return out.drop("_ck") if drop_key else out


def cusum_changepoint(
    df: DataFrame,
    value_col: str = "tok_sum",
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """CUSUM mean-shift changepoint per key: with S_k = Σ_{i≤k}(x_i−x̄)
    (prefix sums in bucket order), the changepoint estimate is
    argmax_k |S_k| (ties → earliest k) and the normalized statistic is
    max_k |S_k| / (σ̂_pop·√n) — the standardized CUSUM whose large
    values reject mean-constancy.

    Plan: broadcast per-key moments join, ONE window sort for the
    prefix sum, a row_number argmax (|S| DESC, position ASC — the
    deterministic tie-break), filter rank 1. Returns one row per key:
    ``n``, ``cp_pos`` (1-based), ``cp_<order_col>``, ``cusum_stat``."""
    keys = keys if keys is not None else ["key"]
    moms = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col(value_col).cast("double")).alias("_xbar"),
        F.stddev_pop(F.col(value_col).cast("double")).alias("_sd"),
    )
    w = Window.partitionBy(*keys).orderBy(order_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        df.join(F.broadcast(moms), keys)
        .withColumn("_dev", F.col(value_col).cast("double") - F.col("_xbar"))
        .withColumn("_s", F.sum("_dev").over(wcum))
        .withColumn("_pos", F.row_number().over(w))
    )
    ranked = scored.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.desc(F.abs(F.col("_s"))), F.asc("_pos"))
        ),
    )
    return ranked.where(F.col("_rk") == 1).select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        F.col("_pos").cast("long").alias("cp_pos"),
        F.col(order_col).alias(f"cp_{order_col}"),
        # sd = 0 (constant series): no scale, stat is NULL — a flatlined
        # key must not abort the multi-key scan under ANSI mode
        F.when(
            F.col("_sd") > 0,
            F.abs(F.col("_s")) / (F.col("_sd") * F.sqrt(F.col("_n").cast("double"))),
        ).alias("cusum_stat"),
    )


def trend_ols(
    df: DataFrame,
    value_col: str = "tok_sum",
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Per-key OLS linear trend over a bucket series, in the CENTERED
    formulation (β̂ = Σ(t−t̄)(v−v̄) / Σ(t−t̄)², α̂ = v̄ − β̂t̄,
    R² = β̂²·Σ(t−t̄)²/Σ(v−v̄)²): centering first keeps every summand at
    O(variance) magnitude, so there is no nΣtv−ΣtΣv catastrophic
    cancellation and the result is stable to summation order at far
    better than the %.5e compare. Returns one row per key: n, slope
    (per second of ``order_col``), intercept, r2.

    Plan: one tiny broadcast means join + one two-phase hash aggregate
    — no window, no sort."""
    keys = keys if keys is not None else ["key"]
    t = F.col(order_col).cast("double")
    v = F.col(value_col).cast("double")
    means = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"), F.avg(t).alias("_tbar"), F.avg(v).alias("_vbar")
    )
    j = df.join(F.broadcast(means), keys)
    dt = t - F.col("_tbar")
    dv = v - F.col("_vbar")
    agg = j.groupBy(*keys).agg(
        F.first("_n").cast("long").alias("n"),
        F.first("_tbar").alias("_tb"),
        F.first("_vbar").alias("_vb"),
        F.sum(dt * dv).alias("_stv"),
        F.sum(dt * dt).alias("_stt"),
        F.sum(dv * dv).alias("_svv"),
    )
    # stt = 0 (single bucket / all-equal order values): slope undefined
    # — NULL, never an ANSI DIVIDE_BY_ZERO abort (same policy as r2)
    slope = F.when(F.col("_stt") > 0, F.col("_stv") / F.col("_stt"))
    return agg.select(
        *keys,
        "n",
        slope.alias("slope"),
        (F.col("_vb") - slope * F.col("_tb")).alias("intercept"),
        F.when(
            (F.col("_svv") > 0) & (F.col("_stt") > 0),
            (slope * slope) * F.col("_stt") / F.col("_svv"),
        ).alias("r2"),
    )


def period_over_period(
    df: DataFrame,
    value_col: str = "tok_sum",
    keys: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Period-over-period change per key: previous bucket's value via
    one lag window, absolute delta and fractional change (null when the
    base is 0 or there is no prior bucket). One window sort per key —
    the standard day-over-day dashboard derivation."""
    keys = keys if keys is not None else ["source"]
    w = Window.partitionBy(*keys).orderBy(order_col)
    v = F.col(value_col).cast("double")
    prev = F.lag(v).over(w)
    return (
        df.withColumn("prev_value", prev)
        .withColumn("delta", v - prev)
        .withColumn(
            "pct_change",
            F.when(prev != 0, (v - prev) / prev),
        )
    )
