"""Scaling-efficiency evidence for the north rule's N → 4N criterion.

No real cluster exists in the sandbox, so the same job runs at two
parallelism levels — ``local[8]`` and ``local[32]`` — over the same
pre-materialized input, and we report throughput at both plus

    efficiency = (T_8 / T_32) / (32 / 8)

(≥ 0.8 target). Each configuration runs in its own subprocess (one JVM
per master setting), ≥3 timed runs after a warm-up, median reported.

The measured job is the engine's end-to-end rollup path: parquet scan →
raw→1m→1h→1d cascade → dense spine + LOCF gap-fill → counts. The token
table is written once with enough input partitions (128) that both
parallelism levels can saturate.

Usage: python tools/bench_scaling.py [n_rows] → one JSON line + a
markdown row for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = "/root/repo/.bench/tokens_parquet"

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from rust_timeseries_spark.session import build_spark
from rust_timeseries_spark.operators import gapfill, rollup

cpus = int(sys.argv[1])
runs = int(sys.argv[2])
spark = build_spark(
    app_name=f"scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)},
)
times, times_1m = [], []
for i in range(runs + 1):  # first run = warm-up (page cache, JIT, codegen)
    # (a) the at-scale-dominant stage: raw scan -> 1m hash aggregate.
    # noop sink forces FULL materialization (count() would let Catalyst
    # prune the aggregate functions away).
    t0 = time.perf_counter()
    df = spark.read.parquet("%(data)s")
    t1m = rollup.rollup_raw(df, "1m", epoch=True)
    t1m.write.format("noop").mode("overwrite").save()
    dt_1m = time.perf_counter() - t0
    # (b) full pipeline: 1m materialized once (persist stands in for the
    # tier write), 1h/1d fold-ups + gap-fill read the materialized tier
    t0 = time.perf_counter()
    t1m = rollup.rollup_raw(spark.read.parquet("%(data)s"), "1m", epoch=True).persist()
    t1h = rollup.fold_up(t1m, "1h", epoch=True)
    t1d = rollup.fold_up(t1h, "1d", epoch=True)
    dense = gapfill.locf(gapfill.densify(t1h, "1h"), ["tok_sum"])
    dense.write.format("noop").mode("overwrite").save()
    t1d.write.format("noop").mode("overwrite").save()
    t1m.unpersist()
    dt = time.perf_counter() - t0
    if i > 0:
        times_1m.append(dt_1m)
        times.append(dt)
print(json.dumps({"cpus": cpus, "times": times, "times_1m": times_1m}))
spark.stop()
""" % {"data": DATA_DIR}


def materialize(n_rows: int) -> None:
    if os.path.exists(DATA_DIR):
        return
    from rust_timeseries_spark import datagen
    from rust_timeseries_spark.session import build_spark

    spark = build_spark(app_name="scale-gen", shuffle_partitions=32)
    df = datagen.with_event_time(datagen.token_table(spark, n_rows, num_partitions=256))
    # rollups never read the token arrays — write the pruned projection
    df.select("doc_id", "source", "ts", "n_tok").write.mode("overwrite").parquet(DATA_DIR)
    spark.stop()


def run_level(cpus: int, runs: int = 2) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g")
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cpus), str(runs)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    materialize(n_rows)
    r8 = run_level(lo, runs)
    r32 = run_level(hi, runs)
    t8 = statistics.median(r8["times"])
    t32 = statistics.median(r32["times"])
    t8m = statistics.median(r8["times_1m"])
    t32m = statistics.median(r32["times_1m"])
    ratio = hi / lo
    result = {
        "n_rows": n_rows,
        "levels": [lo, hi],
        "rollup_1m_stage": {
            "t_lo_sec": round(t8m, 3),
            "t_hi_sec": round(t32m, 3),
            "throughput_lo_seq_per_sec": round(n_rows / t8m, 1),
            "throughput_hi_seq_per_sec": round(n_rows / t32m, 1),
            "scaling_efficiency": round((t8m / t32m) / ratio, 3),
        },
        "full_cascade_gapfill": {
            "t_lo_sec": round(t8, 3),
            "t_hi_sec": round(t32, 3),
            "throughput_lo_seq_per_sec": round(n_rows / t8, 1),
            "throughput_hi_seq_per_sec": round(n_rows / t32, 1),
            "scaling_efficiency": round((t8 / t32) / ratio, 3),
        },
        "runs": {"lo": r8, "hi": r32},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
