"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Three workload families:

* driver-testdata queries (same callables the correctness gate runs) —
  each timed as the MEDIAN of ``$SPARK_GRAFT_BENCH_REPEATS`` (default 3)
  in-process repeats through a noop sink (count() would let Catalyst
  prune computed columns; repeats tame the machine's run-to-run
  variance, which round 1 measured at ±30% on single runs);
* the engine's own north-rule workload: a deterministic synthetic token
  table (JVM-generated, no Python in the row path) pushed through the
  full raw→1m→1h→1d cascade + gap-fill — ALSO materialized via the noop
  sink so nothing is pruned from the timed plan — reported as
  sequences/sec;
* the Gorilla/delta-of-delta encode stage in isolation (the engine's one
  known pure-Python CPU ceiling), reported as values/sec and MB/s of
  encoded output.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
BENCH/BASELINE.md via tools/bench_scaling.py — not run here to keep the
per-round bench fast.
"""

from __future__ import annotations

import json
import os
import statistics
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    token_rows = int(os.environ.get("SPARK_GRAFT_BENCH_TOKEN_ROWS", "1000000"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # per-query MIN-of-medians across independent Spark sessions: a
    # single session's medians still carry session-level noise (JVM JIT
    # state, python-worker memory pressure accumulating over the run —
    # BENCH/BASELINE.md §2 documents ±30% single-run and ~1.5x
    # late-session excursions); the min over 2 sessions is the stable
    # cross-round comparator the r4 verdict asked for (item 9)
    n_sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2"))

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from rust_timeseries_spark import datagen
    from rust_timeseries_spark.operators import compress as compress_ops
    from rust_timeseries_spark.operators import gapfill, rollup
    from rust_timeseries_spark.session import build_spark

    headline = [
        "rollup_1m",
        "token_equality",
        "rollup_1m_salted",
        "streaming_rollup_1m",
        "rollup_1h_fold",
        "rollup_1d_fold",
        "rollup_grouping_sets",
        "session_windows",
        "sliding_windows_3h_1h",
        "rolling_stats_3h",
        "gapfill_locf_1h",
        "gapfill_linear_1h",
        "lag_moments",
        "ewma_1h",
        "ewma_distributed_1h",
        "streaming_ewma_1h",
        "tier_incremental_1h",
        "el_test",
        "hac_covariance",
        "hac_covariance_parzen",
        "hac_covariance_qs",
        "acd_fit_durations",
        "acd_loglik_weibull",
        "acd_loglik_gengamma",
        "acd_covariance_durations",
        "acd_gof_residuals",
        "streaming_rollup_late",
        "pricing_summary",
        "orders_dim_join",
        "dedup_exact",
        "ngram_jaccard",
        "ngram_jaccard_prefix",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "lsh_jaccard_verify",
        "embedding_near_dup",
        "embedding_knn",
        "embedding_knn_ivf",
        "text_quality",
        "image_features",
        "audio_features",
        "video_features",
        "video_features_mjpeg",
        "compression_roundtrip",
        "topk_sources",
        "distinct_users_1d",
        "asof_join_1h",
        "interval_join_1d",
        "doc_split_stats",
        "doc_mixture_budget",
        "bm25_topk",
        "doc_pack_1k",
        "streaming_dedup",
        "dedup_clusters",
        "decontaminate_eval",
        "text_repetition",
        "pii_redact",
        "anomaly_zscore_1h",
        "quantiles_1d",
        "value_histogram",
        "distinct_rollup_sketch",
        "dedup_survivors",
        "dedup_incremental",
        "jsonl_roundtrip",
        "stratified_sample",
        "quality_filter",
        "vocab_topk",
        "winsorize_events",
        "url_domain_stats",
        "line_dedup",
        "dup_span_stats",
        "embedding_kmeans",
        "weighted_sample",
        "cross_corr_1h",
        "cusum_changepoint_1h",
        "seasonal_profile_1h",
        "pivot_report_1d",
        "char_entropy",
        "funnel_conversion_1d",
        "cohort_retention_1d",
        "event_transitions",
        "trend_ols_1h",
        "ab_test_zstat",
        "holt_linear_1h",
        "heavy_hitters",
        "referential_audit",
        "period_over_period_1d",
        "regional_revenue",
        "streaming_sessions",
        "csv_roundtrip",
        "sliding_distinct_3h_1h",
        # cheap scan gates, benched so the perf surface stays congruent
        # with the correctness surface (r4 verdict item 8)
        "acd_forecast_1h",
        "dedup_fingerprints",
        "doc_token_stats",
        "embedding_norms",
        "lang_id",
    ]
    qs = entrymod.queries()

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # one full timing pass per session; warm-up inside each session:
    # session/codegen/page-cache costs land there, not on the first
    # timed query. Two passes: a JVM-side query AND a mapInPandas query
    # — Python-worker + Arrow-serializer spin-up is its own cold cost
    # (~1-2s) and previously landed on image_features' first repeat,
    # skewing its driver-side median 3.6x above steady state
    session_timings: list[dict[str, float]] = []
    spark = None
    for _s in range(n_sessions):
        if spark is not None:
            spark.stop()
        spark = build_spark(
            app_name="rts-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
        )
        run_noop(qs["rollup_1d_fold"](spark, sf_dir))
        run_noop(qs["image_features"](spark, sf_dir))
        cur: dict[str, float] = {}
        for name in headline:
            samples = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                run_noop(qs[name](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            cur[name] = round(statistics.median(samples), 3)
        session_timings.append(cur)
    timings = {
        name: min(t[name] for t in session_timings) for name in headline
    }

    # north-rule workload: token cascade throughput — noop-sink
    # materialization (a count() would let Catalyst prune the aggregate
    # expressions and the LOCF window out of the counted plan)
    tokens = datagen.with_event_time(
        datagen.token_table(spark, token_rows, num_partitions=cpus * 2)
    ).select("doc_id", "source", "ts", "n_tok")
    t0 = time.perf_counter()
    tiers = rollup.tier_cascade(tokens, epoch=True)
    # persist the 1h tier inside the timed section — the real pipeline
    # materializes each tier once; without it the dense sink and the 1d
    # fold would each re-derive datagen→1m→1h
    t1h = tiers["1h"].persist()
    dense = gapfill.locf(gapfill.densify(t1h, "1h"), ["tok_sum"])
    run_noop(dense)
    t1d = rollup.fold_up(t1h, "1d", epoch=True)
    run_noop(t1d)
    cascade_s = time.perf_counter() - t0
    timings["token_cascade_1m_1h_1d"] = round(cascade_s, 3)
    # row counts for the report, deliberately OUTSIDE the timed section
    n_buckets = dense.count()
    n_1d = t1d.count()
    t1h.unpersist()

    # codec encode stage in isolation (known pure-Python CPU ceiling —
    # VERDICT r1 §perf; measured here so the 100 TB cost is explicit).
    # Input: the token table's 1m tier (~1M points at the default
    # row count) cached first, so the timing is encode-only and large
    # enough that pandas-UDF spin-up is noise.
    t1m = rollup.tier_cascade(tokens, epoch=True)["1m"].cache()
    n_points = t1m.count()  # warm the cache so encode timing excludes the rollup
    t0 = time.perf_counter()
    # mapInArrow columnar encode path (round-4: byte-identical blocks,
    # measured ~1.45x the grouped applyInPandas path on both the
    # single-key and wide-keyset shapes)
    blocks = compress_ops.compress_tier_arrow(t1m, "1d")
    agg = blocks.select(
        F.sum("enc_bytes").alias("enc"), F.sum("raw_bytes").alias("raw")
    ).collect()[0]
    encode_s = time.perf_counter() - t0
    t1m.unpersist()
    n_values = n_points * 5  # five encoded columns per tier point

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "repeats": repeats,
                "sessions": n_sessions,
                "per_session_totals": [
                    round(sum(t.values()), 3) for t in session_timings
                ],
                "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
                "token_rows": token_rows,
                "token_seq_per_sec": round(token_rows / cascade_s, 1),
                "token_dense_1h_buckets": n_buckets,
                "token_1d_rows": n_1d,
                "encode_values_per_sec": round(n_values / encode_s, 1),
                "encode_raw_mb_per_sec": round(agg["raw"] / 1e6 / encode_s, 3),
                "encode_compression_ratio": round(agg["raw"] / max(1, agg["enc"]), 3),
                "encode_points": n_points,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
