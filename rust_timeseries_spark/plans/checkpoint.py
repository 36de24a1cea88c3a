"""Checkpoint / lineage / metrics tables for resumable runs.

Three small parquet tables under ``<base>/_meta``:

* ``lineage`` — one row per completed unit of work
  ``(run_id, tier, bucket_day, n_rows, completed_at_run)``; a unit is
  re-run only if absent (the merge itself is idempotent, so replaying a
  half-finished run is safe — lineage only avoids wasted work).
* ``watermark`` — per-key recursion state
  ``(key..., tier, last_bucket_ts, psi_lags array<double>,
  dur_lags array<double>)``: the ψ/EWMA warm-start vector. Seeding the
  next run's kernel with these is exactly the reference's
  ``Init::FixedVector`` resume semantics (src/duration/core/init.rs:
  140-144, SimStart options.rs:450-454) and reproduces the
  uninterrupted ψ path bit-for-bit (tests/test_recursion.py
  ``test_segment_scan_tolerance_parity`` shows exact segment resume).
* ``metrics`` — per-run counters ``(run_id, name, value)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("bucket_day", T.LongType()),
        T.StructField("n_rows", T.LongType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class MetaStore:
    def __init__(self, spark: SparkSession, base_path: str) -> None:
        self.spark = spark
        self.base = base_path.rstrip("/") + "/_meta"

    def _append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(f"{self.base}/{name}")

    def _read(self, name: str, schema: T.StructType) -> DataFrame:
        # only a MISSING table means "not created yet" — any other read
        # failure (corrupt footer, permissions, transient FS error) must
        # propagate: silently returning an empty frame here would reset
        # every watermark and reseed the recursions with wrong values
        # (review r4)
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(f"{self.base}/{name}")
        except AnalysisException as e:
            # structured error class first (stable across Spark message
            # rewording — ADVICE r4), message substrings as fallback for
            # builds that predate error classes on this path
            cond = None
            for attr in ("getCondition", "getErrorClass"):
                fn = getattr(e, attr, None)
                if callable(fn):
                    try:
                        cond = fn()
                        break
                    except Exception:
                        cond = None
            if (cond and "PATH_NOT_FOUND" in cond) or (
                cond is None
                and ("PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e))
            ):
                return self.spark.createDataFrame([], schema)
            raise

    # -- lineage -------------------------------------------------------------

    def record_lineage(self, run_id: str, tier: str, day_rows: list[tuple[int, int]]) -> None:
        rows = [(run_id, tier, int(d), int(n)) for d, n in day_rows]
        self._append(self.spark.createDataFrame(rows, LINEAGE_SCHEMA), "lineage")

    def lineage(self) -> DataFrame:
        return self._read("lineage", LINEAGE_SCHEMA)

    def completed_days(self, tier: str) -> set[int]:
        return {
            r["bucket_day"]
            for r in self.lineage().where(F.col("tier") == tier).select("bucket_day").distinct().collect()
        }

    # -- recursion watermarks (FixedVector warm start) -----------------------

    def watermark_schema(self, keys: list[str]) -> T.StructType:
        return T.StructType(
            [
                *[T.StructField(k, T.StringType()) for k in keys],
                T.StructField("tier", T.StringType()),
                T.StructField("last_bucket_ts", T.LongType()),
                T.StructField("psi_lags", T.ArrayType(T.DoubleType())),
                T.StructField("dur_lags", T.ArrayType(T.DoubleType())),
            ]
        )

    def save_watermarks(self, df: DataFrame) -> None:
        # last write wins: overwrite the whole (small) table
        df.write.mode("overwrite").parquet(f"{self.base}/watermark_new")
        new = self.spark.read.parquet(f"{self.base}/watermark_new")
        new.write.mode("overwrite").parquet(f"{self.base}/watermark")

    def watermarks(self, keys: list[str]) -> DataFrame:
        return self._read("watermark", self.watermark_schema(keys))

    # -- metrics -------------------------------------------------------------

    def record_metrics(self, run_id: str, metrics: dict[str, float]) -> None:
        rows = [(run_id, k, float(v)) for k, v in metrics.items()]
        self._append(self.spark.createDataFrame(rows, METRICS_SCHEMA), "metrics")

    def metrics(self) -> DataFrame:
        return self._read("metrics", METRICS_SCHEMA)
