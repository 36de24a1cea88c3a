"""Probe: can a pure-Spark-SQL-expression (JVM-side) delta-of-delta
encoder beat the mapInArrow + C-kernel path (``compress_tier_arrow``)?

Round-4 verdict item 6: the r4 measurement showed the encode stage's
ceiling is Arrow serialization (the C kernel does 43 M v/s/core; the
stage ~1-6.7 M v/s), so the only way further up would be to keep the
bitstream construction on the JVM. This probe builds the EXACT
``encode_dod_int64`` bitstream (varint count | raw 64-bit first |
zigzag-varint first delta | 0/10+7/110+9/1110+12/1111+64 dod buckets)
out of Spark built-ins only:

* per-block value arrays via ``sort_array(collect_list(...))``,
* dod derivation via ``zip_with`` on shifted slices,
* each dod expanded to 1-2 (bits, nbits) *writes* (``transform`` +
  ``flatten``),
* one ``aggregate`` fold carrying (words array<bigint>, acc, nbits)
  with shift/or bit appends,
* hex rendering + ``unhex`` for the final binary.

Byte identity with the Python/C codec is asserted on every block, so
the measured numbers compare equal work. Decision rule (verdict): adopt
the JVM path iff ≥1.5× the arrow path at byte identity; otherwise this
probe IS the written infeasibility evidence (numbers go to
BENCH/BASELINE.md §3a).

Usage: python tools/jvm_codec_probe.py [n_values] [repeats]
       (synthesizes its own minute-tier input — the sf0.1 tier is too
       small to move either path past fixed job overhead)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _append_sql(state: str, v: str, b: str) -> str:
    """SQL for appending ``b`` bits of ``v`` into the bit-fold state
    struct(words array<bigint>, acc bigint, n int). MSB-first like
    compression.BitWriter; shiftleft's mod-64 semantics are safe because
    acc == 0 whenever n == 0."""
    return f"""
    CASE WHEN {state}.n + {b} < 64 THEN
      named_struct('words', {state}.words,
                   'acc', shiftleft({state}.acc, {b}) | {v},
                   'n', {state}.n + {b})
    ELSE
      named_struct(
        'words', concat({state}.words, array(
          shiftleft({state}.acc, {b} - ({state}.n + {b} - 64))
          | shiftrightunsigned({v}, {state}.n + {b} - 64))),
        'acc', CASE WHEN {state}.n + {b} = 64 THEN CAST(0 AS BIGINT)
                    ELSE {v} & shiftrightunsigned(CAST(-1 AS BIGINT),
                                                  128 - {state}.n - {b}) END,
        'n', {state}.n + {b} - 64)
    END"""


def dod_encode_expr(vals_col: str) -> str:
    """Spark SQL expression producing the encode_dod_int64 blob for a
    sorted array<bigint> column. Supports count < 2^14 and
    zigzag(first delta) < 2^28 (asserted by the caller) — enough for
    any tier block; a general varint just adds CASE arms."""
    n = f"size({vals_col})"
    v0 = f"element_at({vals_col}, 1)"
    d0 = f"(element_at({vals_col}, 2) - element_at({vals_col}, 1))"
    zz0 = f"(CASE WHEN {d0} < 0 THEN -2 * {d0} - 1 ELSE 2 * {d0} END)"
    # header writes: varint(count) | raw64 first | zigzag-varint(d0)
    header = f"""
    concat(
      CASE WHEN {n} < 128 THEN array(named_struct('v', CAST({n} AS BIGINT), 'b', 8))
           ELSE array(named_struct('v', CAST(128 + {n} % 128 AS BIGINT), 'b', 8),
                      named_struct('v', CAST({n} DIV 128 AS BIGINT), 'b', 8)) END,
      CASE WHEN {n} >= 1 THEN array(named_struct('v', {v0}, 'b', 64))
           ELSE array() END,
      CASE WHEN {n} < 2 THEN array()
           WHEN {zz0} < 128 THEN array(named_struct('v', {zz0}, 'b', 8))
           WHEN {zz0} < 16384 THEN array(
             named_struct('v', 128 + {zz0} % 128, 'b', 8),
             named_struct('v', {zz0} DIV 128, 'b', 8))
           WHEN {zz0} < 2097152 THEN array(
             named_struct('v', 128 + {zz0} % 128, 'b', 8),
             named_struct('v', 128 + ({zz0} DIV 128) % 128, 'b', 8),
             named_struct('v', {zz0} DIV 16384, 'b', 8))
           ELSE array(
             named_struct('v', 128 + {zz0} % 128, 'b', 8),
             named_struct('v', 128 + ({zz0} DIV 128) % 128, 'b', 8),
             named_struct('v', 128 + ({zz0} DIV 16384) % 128, 'b', 8),
             named_struct('v', {zz0} DIV 2097152, 'b', 8)) END)
    """
    # dod stream: deltas = v[i+1]-v[i]; dods = d[i+1]-d[i]; each dod →
    # one write (bucket ctrl+payload fused) or two (raw escape)
    dods = f"""
    zip_with(slice({vals_col}, 3, greatest({n} - 2, 0)),
             slice({vals_col}, 2, greatest({n} - 2, 0)),
             (a, b) -> a - b)"""
    dods = f"""
    zip_with({dods},
             zip_with(slice({vals_col}, 2, greatest({n} - 2, 0)),
                      slice({vals_col}, 1, greatest({n} - 2, 0)),
                      (a, b) -> a - b),
             (d2, d1) -> d2 - d1)"""
    writes = f"""
    flatten(transform({dods}, dod ->
      CASE WHEN dod = 0 THEN array(named_struct('v', CAST(0 AS BIGINT), 'b', 1))
           WHEN dod >= -64 AND dod < 64 THEN
             array(named_struct('v', shiftleft(CAST(2 AS BIGINT), 7) | (dod + 64), 'b', 9))
           WHEN dod >= -256 AND dod < 256 THEN
             array(named_struct('v', shiftleft(CAST(6 AS BIGINT), 9) | (dod + 256), 'b', 12))
           WHEN dod >= -2048 AND dod < 2048 THEN
             array(named_struct('v', shiftleft(CAST(14 AS BIGINT), 12) | (dod + 2048), 'b', 16))
           ELSE array(named_struct('v', CAST(15 AS BIGINT), 'b', 4),
                      named_struct('v', dod, 'b', 64)) END))
    """
    # the bit fold: returns the state struct; hex render is a second
    # expression over the materialized state column
    return f"""
    aggregate(
      concat({header}, {writes}),
      named_struct('words', CAST(array() AS ARRAY<BIGINT>),
                   'acc', CAST(0 AS BIGINT), 'n', 0),
      (s, x) -> {_append_sql('s', 'x.v', 'x.b')})
    """


HEX_RENDER = """
unhex(concat(
  concat_ws('', transform(st.words, w -> lpad(hex(w), 16, '0'))),
  CASE WHEN st.n = 0 THEN ''
       ELSE substr(lpad(hex(shiftleft(st.acc, (8 - st.n % 8) % 8)), 16, '0'),
                   17 - 2 * ((st.n + 7) DIV 8))
  END))
"""


def main() -> int:
    n_vals = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import numpy as np

    from rust_timeseries_spark.operators import compress
    from rust_timeseries_spark.session import build_spark

    spark = build_spark(app_name="jvm-codec-probe", shuffle_partitions=32)

    # synthetic minute-tier: 1440 values per 1d block, 32 blocks per
    # series key, small varied jitter so dods exercise the 1/9/12-bit
    # buckets (the sf0.1 tier is too small to move past fixed job
    # overhead — both paths measured ~0.8 s at sf0.01 AND sf0.1)
    base = spark.range(n_vals).select(
        (F.col("id") / (1440 * 32)).cast("long").alias("k"),
        (F.col("id") * 60 + (F.col("id") * F.col("id")) % 17).alias("bucket_ts"),
    )
    base.cache().count()

    blocks = (
        base.withColumn("_bs", F.expr("bucket_ts - bucket_ts % 86400"))
        .groupBy("k", "_bs")
        .agg(F.sort_array(F.collect_list("bucket_ts")).alias("vals"))
    )
    jvm_df = (
        blocks.withColumn("st", F.expr(dod_encode_expr("vals")))
        .withColumn("ts_blob", F.expr(HEX_RENDER))
        .select("k", "_bs", "ts_blob", "vals")
    )

    # sanity: expression limits hold on this data
    lim = blocks.select(
        F.max(F.size("vals")).alias("mx"),
        F.max(F.abs(F.element_at("vals", 2) - F.element_at("vals", 1))).alias("mxd"),
    ).collect()[0]
    assert lim["mx"] < 16384 and (lim["mxd"] or 0) < 2**27, lim

    # byte identity vs the Python/C codec on a 300-block sample (the
    # arrow path's identity to the codec is already pytest-pinned)
    from rust_timeseries_spark.functions import compression as C
    rows = jvm_df.orderBy("k", "_bs").limit(300).collect()
    bad = 0
    for r in rows:
        exp = C.encode_dod_int64(np.array(r["vals"], dtype="int64"))
        if bytes(r["ts_blob"]) != exp:
            bad += 1
    print(f"byte identity: {len(rows) - bad}/{len(rows)} sampled blocks match")
    if bad:
        print("NOT byte-identical — probe invalid")
        return 1
    t1h = base

    # timing: JVM expression path vs compress_tier_arrow restricted to
    # the same single ts column (int_cols=[] so both encode one stream)
    def timeit(fn):
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_jvm = timeit(lambda: jvm_df.select(
        F.sum(F.length("ts_blob"))).collect())
    arrow_df = compress.compress_tier_arrow(
        t1h, "1d", keys=["k"], int_cols=[], float_cols=[],
    )
    t_arrow = timeit(lambda: arrow_df.select(F.sum(F.length("ts_blob"))).collect())

    n_blocks = blocks.count()
    print(f"blocks: {n_blocks}, values: {n_vals}")
    print(f"jvm-expression path:  {t_jvm:.3f} s median  ({n_vals / t_jvm / 1e6:.2f} M v/s)")
    print(f"mapInArrow + kernel:  {t_arrow:.3f} s median  ({n_vals / t_arrow / 1e6:.2f} M v/s)")
    print(f"ratio arrow/jvm: {t_arrow / t_jvm:.2f}x "
          f"({'ADOPT JVM' if t_arrow / t_jvm >= 1.5 else 'keep arrow — below the 1.5x adoption bar'})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
