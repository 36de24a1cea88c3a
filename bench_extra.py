"""Round-6 optimization profiling harness (guide §1.4): per-query
noop-sink isolation timings and `.explain("formatted")` dumps.

The FROZEN driver bench is bench.py — this file exists so the round's
before/after numbers and plan snapshots can be produced without
touching it.

Usage:
  python bench_extra.py [--sf SF_DIR] [--repeats N] [--plans OUTDIR]
                        [--suffix before|after] [query ...]

With no queries given, times every declared query. With --plans, also
writes plans/r06/<query>_<suffix>.txt explain output for each query.
Prints one JSON line {"queries": {name: sec}, "sf": ..., "total": ...}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from rust_timeseries_spark.session import build_spark

    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = build_spark(
        app_name="rts-bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    # warm-up: one JVM-side and one Arrow/pandas query, mirroring bench.py
    qs["rollup_1d_fold"](spark, args.sf).write.format("noop").mode("overwrite").save()
    qs["image_features"](spark, args.sf).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(explain_str(df))
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(samples), 3)
    print(json.dumps({
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "sf": args.sf,
        "repeats": args.repeats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
