"""Tumbling-window rollups and the continuous-aggregate tier cascade.

The heart of the north rule: per-``(source, bucket)`` aggregates of
``n_tok`` (sum/count/min/max, mean derived), materialized at tiers
raw → 1m → 1h → 1d. Higher tiers NEVER rescan raw data — they fold the
next-lower tier (sums/counts/min/max compose exactly; SURVEY.md §2.4
A12). All aggregation is built-in hash-agg with partial (map-side)
combine, so Zipf skew in ``source`` is absorbed before the shuffle: each
map task emits at most |sources|×|buckets-in-partition| rows.

Bucket timestamps use ``date_trunc`` in UTC — cheap, codegen'd, and
exactly composable across tiers (every 1h bucket is the trunc of its 60
1m buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tier name -> date_trunc unit
TIERS = {"1m": "minute", "1h": "hour", "1d": "day"}

#: tier name -> bucket width in seconds (epoch-bucket variant)
TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}

#: the composable aggregate set stored in every tier table
AGG_COLS = ["tok_sum", "tok_count", "tok_min", "tok_max"]


def epoch_seconds(c: Column, dtype: str) -> Column:
    """Epoch seconds (floor) from a timestamp column, independent of the
    session timezone. TIMESTAMP_NTZ is interpreted as UTC wall-clock
    (matching DuckDB's ``epoch()`` on naive timestamps); TIMESTAMP (LTZ)
    casts directly to its underlying instant."""
    if dtype in ("bigint", "long", "int"):
        return c.cast("long")
    if dtype == "timestamp_ntz":
        return (c - F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")).cast("long")
    return c.cast("long")


def bucket_col(ts_col: str | Column, tier: str, epoch: bool = False, dtype: str = "timestamp") -> Column:
    """Tumbling-bucket start for ``tier``.

    ``epoch=False``: ``date_trunc`` timestamp (session TZ; the engine
    pins UTC). ``epoch=True``: epoch-second bigint via pure integer
    arithmetic — timezone-independent, used by the oracle-checked driver
    queries so Spark and DuckDB agree regardless of session TZ.
    """
    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}; expected one of {sorted(TIERS)}")
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if epoch:
        es = epoch_seconds(c, dtype)
        return es - F.pmod(es, F.lit(TIER_SECONDS[tier]))
    return F.date_trunc(TIERS[tier], c)


def rollup_raw(
    df: DataFrame,
    tier: str = "1m",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
    epoch: bool = False,
) -> DataFrame:
    """raw events → one tier of per-(keys, bucket) aggregates.

    This is the reference's "aggregate a series" step generalized to
    grouped data (mean: reference escanciano_lobato.rs:279-283 /
    psi.rs:144); at scale it is a single hash aggregate: partial combine
    per input partition, one shuffle on (keys, bucket_ts), final merge.
    """
    keys = keys if keys is not None else ["source"]
    v = F.col(value_col)
    return (
        df.select(*keys, bucket_col(ts_col, tier, epoch, dict(df.dtypes)[ts_col]).alias("bucket_ts"), v.alias("_v"))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.sum("_v").alias("tok_sum"),
            F.count("_v").alias("tok_count"),
            F.min("_v").alias("tok_min"),
            F.max("_v").alias("tok_max"),
        )
    )


def fold_up(tier_df: DataFrame, to_tier: str, keys: list[str] | None = None, epoch: bool = False) -> DataFrame:
    """Fold a finer tier into a coarser one without touching raw data.

    sum/count/min/max compose exactly; mean is always derived as
    sum/count at read time so it re-composes losslessly (SURVEY.md A12).
    """
    keys = keys if keys is not None else ["source"]
    return (
        tier_df.select(*keys, bucket_col("bucket_ts", to_tier, epoch, dict(tier_df.dtypes)["bucket_ts"]).alias("bucket_ts"), *AGG_COLS)
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.sum("tok_sum").alias("tok_sum"),
            F.sum("tok_count").alias("tok_count"),
            F.min("tok_min").alias("tok_min"),
            F.max("tok_max").alias("tok_max"),
        )
    )


def with_mean(tier_df: DataFrame) -> DataFrame:
    """Attach the derived mean column (never stored — always sum/count)."""
    return tier_df.withColumn("tok_mean", F.col("tok_sum") / F.col("tok_count"))


def tier_cascade(
    df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
    epoch: bool = False,
) -> dict[str, DataFrame]:
    """raw → 1m → 1h → 1d in one lineage. Only the 1m rollup reads raw
    rows; 1h folds 1m; 1d folds 1h. ``epoch=True`` buckets with pure
    integer arithmetic — measured ~1.7× faster than ``date_trunc`` at 32
    threads (timestamp truncation is allocation-heavy)."""
    t1m = rollup_raw(df, "1m", keys, ts_col, value_col, epoch=epoch)
    t1h = fold_up(t1m, "1h", keys, epoch=epoch)
    t1d = fold_up(t1h, "1d", keys, epoch=epoch)
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def rollup_salted(
    df: DataFrame,
    tier: str = "1m",
    n_salts: int = 16,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
    salt_col: str = "doc_id",
    epoch: bool = False,
) -> DataFrame:
    """Two-phase salted rollup for pathological key skew (SURVEY.md
    §4.3.6): phase 1 aggregates per (keys, salt, bucket) — spreading one
    hot source over ``n_salts`` reducers — phase 2 merges the partials.

    Note: for plain hash aggregation Spark's partial combine already
    bounds reducer input, so this variant exists for (a) pipelines whose
    phase-1 output feeds per-key sequential kernels and (b) engines with
    partial-agg disabled. For integral value columns results are
    bit-identical to ``rollup_raw``; for float columns the two-phase sum
    reassociates additions, so last-ulp differences vs a single-phase
    sum are possible — consumers comparing against a single-phase oracle
    must round (the driver query ``rollup_1m_salted`` rounds to 2dp,
    which absorbs this; see the %.5e decimal-tie tripwire in
    tests/test_dataops.py for the general hazard class).
    """
    keys = keys if keys is not None else ["source"]
    salted = df.select(
        *keys,
        bucket_col(ts_col, tier, epoch, dict(df.dtypes)[ts_col]).alias("bucket_ts"),
        F.pmod(F.xxhash64(salt_col), F.lit(n_salts)).alias("_salt"),
        F.col(value_col).alias("_v"),
    )
    partial = salted.groupBy(*keys, "_salt", "bucket_ts").agg(
        F.sum("_v").alias("tok_sum"),
        F.count("_v").alias("tok_count"),
        F.min("_v").alias("tok_min"),
        F.max("_v").alias("tok_max"),
    )
    return (
        partial.groupBy(*keys, "bucket_ts")
        .agg(
            F.sum("tok_sum").alias("tok_sum"),
            F.sum("tok_count").alias("tok_count"),
            F.min("tok_min").alias("tok_min"),
            F.max("tok_max").alias("tok_max"),
        )
    )


def grouping_rollup(df: DataFrame, tier: str = "1d", ts_col: str = "ts", value_col: str = "n_tok", epoch: bool = False) -> DataFrame:
    """Per-source and all-source rollups in a single pass via ROLLUP
    grouping sets (SURVEY.md A13)."""
    return (
        df.select("source", bucket_col(ts_col, tier, epoch, dict(df.dtypes)[ts_col]).alias("bucket_ts"), F.col(value_col).alias("_v"))
        .rollup("source", "bucket_ts")
        .agg(
            F.sum("_v").alias("tok_sum"),
            F.count("_v").alias("tok_count"),
            F.grouping_id().alias("grouping_level"),
        )
    )


def distinct_docs(df: DataFrame, tier: str = "1h", ts_col: str = "ts") -> DataFrame:
    """Approximate distinct doc counts per bucket (HLL sketch — SURVEY.md
    A14); sketches merge map-side so this shuffles only sketch bytes."""
    return (
        df.select("source", bucket_col(ts_col, tier).alias("bucket_ts"), "doc_id")
        .groupBy("source", "bucket_ts")
        .agg(F.approx_count_distinct("doc_id").alias("approx_docs"))
    )


def top_k_sources(tier_df: DataFrame, k: int = 5, round_to: int | None = None) -> DataFrame:
    """Top-k sources by total tokens (TakeOrderedAndProject — no full
    sort; per-partition top-k then driver merge).

    ``round_to`` rounds totals BEFORE ranking: a float sum's last-ulp
    depends on reduction order, so two engines (or two runs) can rank
    effectively-tied sources differently on the raw sum — rounding
    collapses such ties so the ``source`` tie-break decides
    deterministically (caught by the sf1 sweep, where replicated keys
    have exactly-tied totals)."""
    total = F.sum("tok_sum")
    if round_to is not None:
        total = F.round(total, round_to)
    return (
        tier_df.groupBy("source")
        .agg(total.alias("total_tok"))
        .orderBy(F.desc("total_tok"), F.asc("source"))
        .limit(k)
    )


def sliding_rollup(
    df: DataFrame,
    window_len: str = "10 minutes",
    slide: str = "1 minute",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
) -> DataFrame:
    """Sliding-window rollup (SURVEY.md W10 sliding variant):
    ``F.window(ts, len, slide)`` — each row lands in len/slide windows;
    Spark expands them JVM-side before the hash aggregate."""
    keys = keys if keys is not None else ["source"]
    v = F.col(value_col)
    return (
        df.groupBy(*keys, F.window(ts_col, window_len, slide).alias("win"))
        .agg(
            F.sum(v).alias("tok_sum"),
            F.count(v).alias("tok_count"),
            F.min(v).alias("tok_min"),
            F.max(v).alias("tok_max"),
        )
        .select(*keys, F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"),
                *AGG_COLS)
    )


def session_rollup(
    df: DataFrame,
    gap: str = "5 minutes",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "n_tok",
) -> DataFrame:
    """Session-window rollup: adjacent events within ``gap`` merge into
    one session (``F.session_window`` — noted optional in SURVEY §2.5,
    included for completeness)."""
    keys = keys if keys is not None else ["source"]
    v = F.col(value_col)
    return (
        df.groupBy(*keys, F.session_window(ts_col, gap).alias("win"))
        .agg(F.sum(v).alias("tok_sum"), F.count(v).alias("tok_count"))
        .select(*keys, F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"), "tok_sum", "tok_count")
    )


def quantile_rollup(
    df: DataFrame,
    tier: str = "1d",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
    epoch: bool = False,
    check_eps: float | None = None,
) -> DataFrame:
    """Per-(keys, bucket) EXACT percentiles plus the sketch the 100 TB
    path would actually ship: ``approx_percentile`` (Spark's
    KLL/Greenwald-Khanna-family sketch — mergeable, bounded memory,
    map-side combinable) at the given ``accuracy``.

    The exact path buffers each group's sorted values — correct and
    fine up to ~10⁷ rows/group — and computes the standard linear
    interpolation EXPLICITLY (``lo + (hi−lo)·frac`` at rank
    ``p·(n−1)``) instead of calling the built-in ``percentile``:
    engines disagree in the last ulp of their internal interpolation
    (Spark's ``(1−g)·lo + g·hi`` vs DuckDB's fused form), which flips
    `%.5e` renderings at rounding boundaries; spelling out one formula
    makes the result bit-portable across engines. The sketch column is
    the scale path, emitted alongside so every gate run re-validates
    the sketch against exact within tolerance (same exact+approx
    pattern as ``distinct_docs``' HLL flag).

    Output: keys, bucket_ts, n, q_exact (array<double>, one per p),
    q_approx (array, same order); with ``check_eps`` set, a boolean
    ``approx_within_eps``: every sketch value must lie within the
    ACTUAL-VALUE envelope [vs[⌊(p−ε)(n−1)⌋], vs[⌈(p+ε)(n−1)⌉]] — the
    rank-space guarantee the sketch makes. Floor/ceil (never
    interpolation) so the envelope is ≥ one rank step wide even for
    tiny groups, where an interpolated ±ε band is narrower than the
    gap between adjacent actual values and any sketch would "fail".
    """
    keys = keys if keys is not None else ["source"]
    parr = ", ".join(str(p) for p in ps)
    b = bucket_col(ts_col, tier, epoch, dict(df.dtypes)[ts_col])
    g = (
        df.select(*keys, b.alias("bucket_ts"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.count("_v").alias("n"),
            F.sort_array(F.collect_list("_v")).alias("_vs"),
            F.expr(f"approx_percentile(_v, array({parr}), {accuracy})").alias("q_approx"),
        )
    )
    nn = F.col("n")
    exact = []
    flag = None
    for i, p in enumerate(ps):
        rank = F.lit(float(p)) * (nn - 1).cast("double")
        li = F.floor(rank)
        lo = F.element_at("_vs", (li + 1).cast("int"))
        hi = F.element_at("_vs", F.least(li + 2, nn.cast("long")).cast("int"))
        exact.append(lo + (hi - lo) * (rank - li))
        if check_eps is not None:
            lo_r = F.greatest(
                F.floor(F.lit(float(p - check_eps)) * (nn - 1).cast("double")), F.lit(0)
            )
            hi_r = F.least(
                F.ceil(F.lit(float(p + check_eps)) * (nn - 1).cast("double")),
                (nn - 1).cast("long"),
            )
            env_lo = F.element_at("_vs", (lo_r + 1).cast("int"))
            env_hi = F.element_at("_vs", (hi_r + 1).cast("int"))
            ap = F.element_at("q_approx", i + 1)
            c = (ap >= env_lo) & (ap <= env_hi)
            flag = c if flag is None else (flag & c)
    out = [*keys, "bucket_ts", "n", F.array(*exact).alias("q_exact"), "q_approx"]
    if check_eps is not None:
        out.append(flag.alias("approx_within_eps"))
    return g.select(*out)


def winsorize(
    df: DataFrame,
    keys: list[str] | None = None,
    value_col: str = "value",
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Per-key WINSORIZATION — clip each value into its key's exact
    [p_lo, p_hi] percentile band, the outlier-taming step run before
    means/EWMA on heavy-tailed metrics. Two passes:

    1. bounds aggregate: one shuffle on ``keys``; exact interpolated
       percentiles via the same spelled-out ``lo + (hi−lo)·frac``
       convention as ``quantile_rollup`` (engines disagree in the last
       ulp of their built-in interpolations — one pinned formula makes
       the clip bounds, and therefore every clipped value,
       bit-portable);
    2. bounds join back — a broadcast hash join (the bounds table has
       one row per key) — and a clip projection.

    The exact path buffers each key's sorted values (fine to ~10⁷
    rows/key); for giant keys swap stage 1 to ``approx_percentile``
    and keep the identical stage 2 (same escape documented on
    ``quantile_rollup``). Adds ``clip_lo``/``clip_hi``, the clipped
    ``{value_col}_w``, and ``clipped_below``/``clipped_above`` flags.
    """
    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo=} {p_hi=}")
    keys = keys if keys is not None else ["event_type"]
    v = F.col(value_col).cast("double")
    g = (
        df.where(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sort_array(F.collect_list(v)).alias("_vs"),
        )
    )
    nn = F.col("_n")
    bcols = []
    for p, name in ((p_lo, "clip_lo"), (p_hi, "clip_hi")):
        rank = F.lit(float(p)) * (nn - 1).cast("double")
        li = F.floor(rank)
        lo = F.element_at("_vs", (li + 1).cast("int"))
        hi = F.element_at("_vs", F.least(li + 2, nn.cast("long")).cast("int"))
        bcols.append((lo + (hi - lo) * (rank - li)).alias(name))
    bounds = g.select(*keys, *bcols)
    j = df.join(F.broadcast(bounds), keys, "left")
    clipped = F.least(F.greatest(v, F.col("clip_lo")), F.col("clip_hi"))
    return (
        j.withColumn(f"{value_col}_w", clipped)
        .withColumn("clipped_below", v < F.col("clip_lo"))
        .withColumn("clipped_above", v > F.col("clip_hi"))
    )


def value_histogram(
    df: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width value histogram per key — the data-profiling
    primitive (distribution drift checks, outlier share monitoring)
    that runs as ONE two-phase aggregate at any corpus size: bin index
    is a pure projection, so partial counts combine map-side and the
    shuffle carries ≤ keys × (n_bins + 2) rows regardless of input.

    Bin layout: ``-1`` = underflow (v < lo), ``n_bins`` = overflow
    (v ≥ hi), else ``floor((v − lo) / w)`` with ``w = (hi − lo) /
    n_bins``; null values are excluded (profile them via the count
    delta). Output: keys, ``bin``, ``bin_lo`` (double — exact when the
    grid is representable), ``n``, ``frac`` (n / key total — an exact
    int/int IEEE division, so any SQL engine reproduces it bit-for-
    bit)."""
    if not (hi > lo) or n_bins <= 0:
        raise ValueError(f"need hi > lo and n_bins > 0, got {lo=} {hi=} {n_bins=}")
    keys = keys if keys is not None else ["event_type"]
    w = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_ = (
        F.when(v < F.lit(float(lo)), F.lit(-1))
        .when(v >= F.lit(float(hi)), F.lit(n_bins))
        .otherwise(F.floor((v - F.lit(float(lo))) / F.lit(w)))
        .cast("long")
    )
    g = (
        df.where(v.isNotNull())
        .select(*keys, bin_.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = Window.partitionBy(*keys)
    return g.select(
        *keys,
        "bin",
        (F.lit(float(lo)) + F.col("bin") * F.lit(w)).alias("bin_lo"),
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("frac"),
    )


def sketch_distinct_rollup(
    df: DataFrame,
    id_col: str,
    tier: str,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    lg_k: int = 12,
    epoch: bool = True,
) -> DataFrame:
    """Per-``(keys, bucket)`` HLL distinct-count SKETCHES at ``tier`` —
    the mergeable companion to ``rollup_raw`` for COUNT DISTINCT, which
    (unlike sum/count/min/max) does not compose across tiers as plain
    values. The Datasketches HLL register array DOES compose (register-
    wise max), so a tier table can store one ``binary`` sketch per
    bucket and every higher tier folds sketches instead of re-scanning
    raw — the same never-rescan-raw contract the ``AGG_COLS`` tiers
    keep (module docstring / SURVEY.md §2.4 A12/A14).

    State is bounded: ≤ keys × buckets × 2^lg_k registers regardless of
    input rows; the aggregate combines map-side like any hash agg. The
    default lg_k=12 gives rsd ≈ 1.04/√4096 ≈ 1.6%. Output: keys,
    ``bucket_ts``, ``hll`` (binary sketch), ``n_exactish`` estimate
    column deliberately NOT included — estimate at read time via
    ``F.hll_sketch_estimate`` so merged and leaf tiers stay one type."""
    keys = keys if keys is not None else ["source"]
    dtype = dict(df.dtypes).get(ts_col, "timestamp")
    b = bucket_col(ts_col, tier, epoch=epoch, dtype=dtype)
    return (
        df.groupBy(*keys, b.alias("bucket_ts"))
        .agg(F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("hll"))
    )


def fold_sketch_tier(
    sketch_tier: DataFrame,
    to_tier: str,
    keys: list[str] | None = None,
    epoch: bool = True,
) -> DataFrame:
    """Fold an HLL sketch tier to a coarser tier by register union —
    COUNT DISTINCT across tiers WITHOUT re-scanning raw data. Exact
    analogue of ``fold_up`` for the sketch column: the 1d sketch of a
    key is the union of its 24 1h sketches, and the union estimate
    equals the estimate of sketching the whole day directly (register-
    wise max is associative/commutative/idempotent). Adds
    ``n_distinct_est`` (the rounded estimator value) alongside the
    still-mergeable ``hll``.

    Estimator nuance (Datasketches): a stream-built sketch estimates
    with HIP (order-dependent, slightly tighter); a UNION result can
    only use the composite estimator. Both sit inside the same rsd
    envelope of the true cardinality, but ``estimate(fold(parts)) ==
    estimate(direct)`` holds exactly only in the sparse/exact regime —
    past it they differ by O(rsd) (measured ±3 counts at ~550 users,
    sf0.1). The driver gate therefore pins each estimate against the
    EXACT count, never against the other estimate
    (``test_sketch_fold_vs_direct`` pins both regimes)."""
    keys = keys if keys is not None else ["source"]
    b = bucket_col("bucket_ts", to_tier, epoch=epoch, dtype="bigint" if epoch else "timestamp")
    g = (
        sketch_tier.groupBy(*keys, b.alias("bucket_ts"))
        .agg(F.hll_union_agg(F.col("hll")).alias("hll"))
    )
    return g.withColumn("n_distinct_est", F.hll_sketch_estimate("hll"))


def tier_diff(tier_a: DataFrame, tier_b: DataFrame) -> DataFrame:
    """Set-operation consistency check between two materializations of
    the same tier (SURVEY.md §2.7): rows in exactly one side via
    exceptAll both ways. Empty result ⇔ identical multisets."""
    cols = tier_a.columns
    only_a = tier_a.select(*cols).exceptAll(tier_b.select(*cols)).withColumn("side", F.lit("a"))
    only_b = tier_b.select(*cols).exceptAll(tier_a.select(*cols)).withColumn("side", F.lit("b"))
    return only_a.unionByName(only_b)


def seasonal_profile(
    tier_df: DataFrame,
    period: int = 24,
    bucket_width: int = 3600,
    value_col: str = "tok_sum",
    keys: list[str] | None = None,
    bucket_col_name: str = "bucket_ts",
) -> DataFrame:
    """Seasonal-naive decomposition profile over an epoch-bucketed tier:
    phase = ``(bucket_ts DIV width) % period`` (pure integer epoch math,
    timezone-independent — phase 0 is the UTC-midnight hour for the
    1h/24 default), then per ``(keys, phase)`` the seasonal mean/std and
    count. Subtracting ``phase_mean`` from each bucket is the seasonal
    adjustment; the per-phase std over n shows where the profile is
    tight vs noisy (seasonal strength = 1 − E[var_resid]/var_total
    follows by aggregating these rows).

    One two-phase hash aggregate — the identical single-shuffle plan
    shape as ``rollup_raw``; phase derivation is codegen projection."""
    keys = keys if keys is not None else ["source"]
    phase = (
        (F.col(bucket_col_name).cast("long") / F.lit(bucket_width)).cast("long")
        % F.lit(period)
    ).cast("int")
    v = F.col(value_col).cast("double")
    return (
        tier_df.withColumn("phase", phase)
        .groupBy(*keys, "phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(v).alias("phase_sum"),
            F.avg(v).alias("phase_mean"),
            F.stddev_samp(v).alias("phase_std"),
        )
    )


def pivot_report(
    df: DataFrame,
    pivot_col: str,
    pivot_values: list[str],
    tier: str = "1d",
    ts_col: str = "ts",
    value_col: str = "value",
    epoch: bool = True,
) -> DataFrame:
    """Wide pivot rollup: one row per time bucket, one (count, cents
    sum) column pair per pinned ``pivot_values`` entry — the matrix
    report a dashboard exports. ``pivot_values`` is REQUIRED: passing
    the distinct set explicitly keeps the plan a single two-phase hash
    aggregate (Spark's values-less ``pivot()`` runs a separate distinct
    job first — a second full scan at 100 TB) and pins the output
    schema. Currency sums use the engine's integer-cents convention
    (pinned IEEE rounding, order-independent BIGINT sum)."""
    b = bucket_col(ts_col, tier, epoch=epoch, dtype=dict(df.dtypes)[ts_col]).alias("bucket_ts")
    pc = F.col(pivot_col)
    cents = F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5)).cast("long")
    aggs = []
    for val in pivot_values:
        hit = pc == F.lit(val)
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias(f"{val}_n"))
        aggs.append(
            (
                F.sum(F.when(hit, cents).otherwise(F.lit(0))).cast("decimal(38,2)")
                / F.lit(100)
            ).cast("decimal(38,2)").alias(f"{val}_sum")
        )
    return df.select(b, pc, F.col(value_col)).groupBy("bucket_ts").agg(*aggs)


def sliding_distinct(
    df: DataFrame,
    id_col: str = "user_id",
    window_len: str = "3 hours",
    slide: str = "1 hour",
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Exact distinct-entity counts over SLIDING windows (the trailing
    active-users metric): each row expands into len/slide windows
    JVM-side, then one distinct-count hash aggregate per
    (keys, window). For approximate mergeable variants see
    ``sketch_distinct_rollup`` — distinct does NOT fold across
    overlapping windows, so the exact version must re-aggregate raw
    rows (this operator), while the sketch version unions per-tier HLL
    state."""
    keys = keys if keys is not None else ["source"]
    return (
        df.groupBy(*keys, F.window(ts_col, window_len, slide).alias("win"))
        .agg(F.countDistinct(id_col).alias("n_distinct"))
        .select(*keys, F.col("win.start").alias("win_start"), "n_distinct")
    )
