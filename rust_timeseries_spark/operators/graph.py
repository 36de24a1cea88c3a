"""Distributed connected components for dedup clustering.

Reference scope note: the reference engine (mickwise/rust_timeseries)
has no graph surface — this is a graft-added operator the 100 TB
training-data mission needs: every near-dup pipeline (MinHash-LSH,
SimHash, embedding near-dup — ``operators/dedup.py``) emits candidate
PAIRS, but the keep/drop decision needs CLUSTERS (a ~ b, b ~ c ⇒
{a,b,c} keep one).  Pair→cluster is transitive closure = connected
components.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", ACM SoCC 2014).  Published convergence is O(log² n)
rounds (O(log n) in practice); each round is two shuffles (a groupBy
min + a join), so a 10¹⁰-edge graph costs ~15 × 2 shuffles instead of
the O(diameter) rounds of naive label propagation (a 10⁶-long chain —
exactly what exact-dup chains look like — takes ~20 rounds here vs 10⁶
rounds naive).  All DataFrame ops: no RDDs, no driver-side adjacency.

Per-round semantics (node ids are totally ordered; Γ(u) = neighbors):

* large-star(u): m = min(Γ(u) ∪ {u}); emit (w, m) for w ∈ Γ(u), w > u.
  (Strictly-larger neighbors re-attach to the neighborhood minimum.)
* small-star(u): over edges oriented u > v; m = min(Γ⁻(u) ∪ {u});
  emit (w, m) for w ∈ Γ⁻(u) ∪ {u}, w ≠ m.

Both preserve connectivity and monotonically decrease the potential
Σ(u − root(u)); the fixed point is a star forest where every node
points at its component's minimum id.

Convergence detection: the canonical oriented edge set is compared
across rounds by (count, xxhash64-sum) — two scalar aggregates per
round, never a data-proportional collect.  Lineage is truncated with
``localCheckpoint`` each round (iterative self-joins otherwise stack
an unbounded logical plan); on a real cluster prefer
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
executor-loss resilience (same API shape, noted for deploy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set, oriented larger→smaller, self-loops dropped,
    deduplicated. Columns: (u, v) with u > v."""
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).where(F.col("a") != F.col("b"))
    return (
        e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Edges in any orientation → for each u attach strictly-larger
    neighbors to min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    out = (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _small_star(e: DataFrame) -> DataFrame:
    """Edges oriented u > v → re-point each smaller neighborhood
    (including u itself) at its minimum."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = d.join(mins, "u").select(F.col("v").alias("w"), "m")
    selfs = mins.select(F.col("u").alias("w"), "m")
    out = (
        nbrs.union(selfs)
        .where(F.col("w") != F.col("m"))
        .select(F.col("w").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return out


def _edge_signature(e: DataFrame) -> tuple[int, int]:
    """(count, order-independent hash-xor) of the canonical edge set —
    two scalars, the only driver-side data each round.  bit_xor (not
    sum) because ANSI mode makes a hash SUM overflow at ~2 rows; xor is
    overflow-free, and the edge set is distinct so no cancellation."""
    row = e.select(
        F.greatest("u", "v").alias("cu"), F.least("u", "v").alias("cv")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(cu, cv))").alias("h"),
    ).collect()[0]
    return int(row["n"] or 0), int(row["h"] or 0)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns a DataFrame ``(node: long, component: long)`` covering every
    node that appears in any edge; ``component`` is the minimum node id
    reachable from ``node`` (a canonical, engine-portable label).
    Isolated nodes never enter ``edges`` and are the caller's join-back
    (a doc with no near-dup pair is its own cluster by definition).

    Raises ``RuntimeError`` if the star iteration has not converged
    after ``max_iter`` rounds (published bound is O(log² n); 50 rounds
    covers graphs far past 10^15 nodes — non-convergence means a bug,
    not a big graph).
    """
    # checkpoint BEFORE the loop: round 1's large-star references the
    # edge set twice (groupBy-min + join), so an un-materialized input
    # would evaluate the caller's whole pair-generation pipeline twice
    # (measured ~2× the pair cost on the threshold-Jaccard gate)
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sig = _edge_signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # Fixed point is a star forest u→root. Roots map to themselves.
    roots = e.select(F.col("v").alias("node")).distinct()
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return members.unionByName(
        roots.select("node", F.col("node").alias("component"))
    ).distinct()


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The END of the dedup pipeline: pairs → clusters → ONE survivor
    per cluster, chosen by quality. Every input doc gets a row:

    - docs in no pair are their own singleton cluster (kept);
    - within a cluster the survivor is the max-``quality_col`` doc,
      ties broken by smallest id (deterministic on any engine).

    Cost shape at scale: ``dedup_clusters`` (O(log² n) star rounds over
    the PAIRS only — near-dup pairs are a tiny fraction of the corpus),
    one left join back to docs on id, then one window shuffle keyed by
    ``cluster_id``. Cluster sizes are bounded in practice (a pathological
    giant cluster means the threshold is wrong, not the engine), so the
    row_number sort never sees a skew key worse than the biggest dup
    family. Output: ``id_col``, ``quality_col``, ``cluster_id``,
    ``cluster_size``, ``keep``."""
    cl = dedup_clusters(pairs, id_a=id_a, id_b=id_b).withColumnRenamed("doc_id", id_col)
    j = (
        docs.select(id_col, quality_col)
        .join(cl, id_col, "left")
        .select(
            id_col,
            quality_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1).cast("long")).alias("cluster_size"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return j.withColumn("keep", F.row_number().over(w) == 1)


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup PAIRS → canonical CLUSTERS: ``(doc_id, cluster_id,
    cluster_size)`` for every doc in at least one pair, where
    ``cluster_id`` is the smallest doc_id in the connected component
    (the conventional "keep the first, drop the rest" dedup policy
    keeps ``doc_id == cluster_id``).  ``cluster_size`` joins back from
    a component rollup — a second small shuffle on the component key."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size"),
        )
    )
