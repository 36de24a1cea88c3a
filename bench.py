"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Two workload families:

* driver-testdata queries (same callables the correctness gate runs),
  timed at sf0.1;
* the engine's own north-rule workload: a deterministic synthetic token
  table (JVM-generated, no Python in the row path) pushed through the
  full raw→1m→1h→1d cascade + gap-fill, reported as sequences/sec.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
BENCH/BASELINE.md via tools/bench_scaling.py — not run here to keep the
per-round bench fast.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    token_rows = int(os.environ.get("SPARK_GRAFT_BENCH_TOKEN_ROWS", "1000000"))

    import __spark_entry__ as entrymod
    from rust_timeseries_spark import datagen
    from rust_timeseries_spark.operators import gapfill, rollup
    from rust_timeseries_spark.session import build_spark

    spark = build_spark(app_name="rts-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    headline = [
        "rollup_1m",
        "rollup_1h_fold",
        "rollup_1d_fold",
        "rollup_grouping_sets",
        "rolling_stats_3h",
        "gapfill_locf_1h",
        "gapfill_linear_1h",
        "lag_moments",
        "ewma_1h",
        "el_test",
        "hac_covariance",
        "pricing_summary",
        "orders_dim_join",
        "dedup_exact",
        "ngram_jaccard",
        "embedding_knn",
        "text_quality",
        "compression_roundtrip",
    ]
    qs = entrymod.queries()
    # warm-up: session/codegen/page-cache costs land here, not on the
    # first timed query
    qs["rollup_1d_fold"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        # noop sink forces FULL materialization (count() would let
        # Catalyst prune computed columns out of the plan)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # north-rule workload: token cascade throughput
    t0 = time.perf_counter()
    tokens = datagen.with_event_time(
        datagen.token_table(spark, token_rows, num_partitions=cpus * 2)
    ).select("doc_id", "source", "ts", "n_tok")
    tiers = rollup.tier_cascade(tokens, epoch=True)
    dense = gapfill.locf(gapfill.densify(tiers["1h"], "1h"), ["tok_sum"])
    n_buckets = dense.count()
    n_1d = tiers["1d"].count()
    cascade_s = time.perf_counter() - t0
    timings["token_cascade_1m_1h_1d"] = round(cascade_s, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
                "token_rows": token_rows,
                "token_seq_per_sec": round(token_rows / cascade_s, 1),
                "token_dense_1h_buckets": n_buckets,
                "token_1d_rows": n_1d,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
