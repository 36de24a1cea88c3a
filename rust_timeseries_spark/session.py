"""SparkSession factory with the engine's pinned configuration.

All engine entry points accept an existing SparkSession; this factory is
for tests / bench / spark-submit drivers. Configuration follows
SURVEY.md §4.2: AQE on (shuffle coalescing + skew-join splitting),
Arrow-based pandas UDF transfer on (the engine's Python boundary is
Arrow batches, mirroring the reference's zero-copy PyO3 boundary,
reference src/utils.rs:37-44), shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "rust_timeseries_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster, pass ``master=None`` with a pre-configured
    spark-submit environment and only the SQL confs below are applied.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join split —
        # load-bearing at 100 TB where `source` is Zipf-skewed.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for every pandas UDF / applyInPandas kernel.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic session timezone: bucket boundaries must not
        # depend on the host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate synthesizes `size(e) > 0 AND
        # isnotnull(e)` below every explode. Every generator input in
        # this engine is a COMPUTED array (shingles, n-grams, banded
        # signatures — never a scanned column), so the inferred filter
        # can never reach PushedFilters; it only re-evaluates the most
        # expensive expression in the plan a second time, and predicate
        # pushdown then drags it below the parallelizing repartition
        # onto the single-split scan task. Scale-independent: the rule
        # is pure overhead whenever the generator input is derived
        # (measured 2.6× on the MinHash signature pass, 2× on the
        # n-gram decontamination scan at sf1).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
