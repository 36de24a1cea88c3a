"""Data-quality audits over dimensional schemas: referential-integrity
orphan checks (child keys with no parent / parents with no children)
as broadcast-or-shuffle anti-joins, the first thing a pipeline runs
over a freshly-landed 100 TB drop.

Each check is one LEFT ANTI equi-join — Catalyst picks broadcast for a
small parent side and a shuffled hash/sort-merge join otherwise; no
cartesian is ever planned. Counting happens AFTER the anti-join so the
shuffle carries only violations (normally ~0 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Rows of ``child`` whose ``child_key`` has no match in
    ``parent.parent_key`` (NULL keys count as orphans — a NULL FK never
    satisfies an equi-join, which is the audit-relevant reading)."""
    pk = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(pk, child_key, "left_anti")


def referential_audit(checks: list[tuple[str, DataFrame, DataFrame, str, str]]) -> DataFrame:
    """Run a list of ``(name, child, parent, child_key, parent_key)``
    orphan checks and return one row per check: ``check``, ``n_orphans``
    (exact), ``sample_key`` (smallest violating key, null when clean) —
    the audit report a pipeline gates a load on."""
    out = None
    for name, child, parent, ck, pk in checks:
        o = orphans(child, parent, ck, pk)
        agg = o.agg(
            F.lit(name).alias("check"),
            F.count(F.lit(1)).cast("long").alias("n_orphans"),
            F.min(ck).cast("string").alias("sample_key"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out
