"""Physical-layout control for tier/parquet sinks: partitioned writes
with bounded file sizes and WITHIN-FILE clustering, so downstream scans
get partition pruning (directory level) + row-group min/max pruning
(file level) without any global sort.

At 100 TB the difference between `orderBy(...).write` (a full range-
partitioning shuffle + skew-prone global sort) and
`repartition(keys).sortWithinPartitions(cluster)` (one hash shuffle,
local sorts, streaming write) is the difference between a day and an
hour; the min/max pruning benefit is identical for point/range
predicates on the cluster columns because parquet stats are per
row-group, not cross-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str],
    max_records_per_file: int = 1_000_000,
    partitions_per_key: int = 1,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by``
    directories, each task's output sorted by ``cluster_by`` and split
    at ``max_records_per_file`` rows (splitting preserves the sort, so
    every file covers a tight, non-overlapping ``cluster_by`` range
    within its task).

    Plan contract (plan check 44): ONE hash Exchange on
    ``partition_by`` (so each directory is written by few tasks —
    no small-file explosion), a LOCAL Sort, no range partitioning.
    ``partitions_per_key > 1`` salts giant partitions across several
    writer tasks."""
    parts = df
    if partitions_per_key > 1:
        from pyspark.sql import functions as F

        salt = (F.rand(seed=42) * partitions_per_key).cast("int")
        parts = df.withColumn("_wsalt", salt).repartition(*partition_by, "_wsalt").drop("_wsalt")
    else:
        parts = df.repartition(*partition_by)
    (
        parts.sortWithinPartitions(*partition_by, *cluster_by)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
