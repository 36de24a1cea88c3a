"""spark-submit entry point for the rollup pipeline.

Cluster launch (the ``--py-files`` contract from the north rule):

    python tools/make_pyfiles_zip.py             # → dist/rust_timeseries_spark.zip
    spark-submit \\
        --py-files dist/rust_timeseries_spark.zip \\
        rust_timeseries_spark/cli.py \\
        --input  /path/to/tokens_table \\
        --output /path/to/tiers \\
        --run-id run-2026-08-16 \\
        [--input-format iceberg|parquet] [--incremental-since EPOCH_S]

Local smoke run (no cluster):

    python -m rust_timeseries_spark.cli --input ... --output ... --local
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="token-sequence rollup pipeline")
    ap.add_argument("--input", required=True, help="token table path (doc_id, tokens, n_tok, source)")
    ap.add_argument("--output", required=True, help="tier-store base path")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--input-format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--incremental-since", type=int, default=None,
                    help="epoch seconds; only reprocess days with events at/after this")
    ap.add_argument("--local", action="store_true", help="build a local[] SparkSession")
    ap.add_argument("--skip-invariants", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if args.local:
        from rust_timeseries_spark.session import build_spark
        spark = build_spark(app_name="rts-pipeline")
    else:
        spark = SparkSession.builder.getOrCreate()

    # absolute imports: spark-submit runs this file as a top-level
    # script (no parent package) with the package supplied via
    # --py-files — relative imports would raise ImportError there
    from rust_timeseries_spark.datagen import with_event_time
    from rust_timeseries_spark.operators.rollup import epoch_seconds
    from rust_timeseries_spark.plans.pipeline import RollupPipeline
    from rust_timeseries_spark.sources.tokens import assert_invariants, read_tokens

    raw = read_tokens(spark, args.input, args.input_format)
    if not args.skip_invariants:
        assert_invariants(raw)
    if "ts" not in raw.columns:
        raw = with_event_time(raw)

    pipe = RollupPipeline(spark, args.output)
    if args.incremental_since is not None:
        es = epoch_seconds(F.col("ts"), dict(raw.dtypes)["ts"])
        batch = raw.where(es >= args.incremental_since)
        metrics = pipe.run_increment(raw, batch, args.run_id)
    else:
        pipe.store.materialize_full(raw.select("doc_id", "source", "ts", "n_tok"))
        pipe._advance_ewma_watermarks(pipe.store.read_tier("1h"))
        n = pipe.store.read_tier("1d").count()
        metrics = {"mode": "full", "tier_1d_rows": n}
        pipe.meta.record_metrics(args.run_id, {"tier_1d_rows": float(n)})
    print(json.dumps({"run_id": args.run_id, **{k: v for k, v in metrics.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
