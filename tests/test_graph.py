"""Connected components (large-star/small-star) vs a pure-Python
union-find oracle, including the chain topology that defeats naive
label propagation."""

from __future__ import annotations

import random

import pytest

from rust_timeseries_spark.operators import graph as G


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id of the component
    return {n: find(n) for n in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = G.connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)]
    got = _run(spark, edges)
    assert got == _union_find(edges)
    assert set(got.values()) == {1, 20}


def test_chain_converges_in_log_rounds(spark):
    """A 200-node path: naive min-label propagation needs ~200 rounds;
    the star algorithm must finish inside the published O(log² n)
    bound (we pin ≤ 12 — empirically it's ~5)."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    # count rounds by instrumenting the signature loop
    rounds = 0
    e = G._canonical_edges(df, "src", "dst")
    sig = None
    for _ in range(12):
        e = G._small_star(G._large_star(e)).localCheckpoint(eager=True)
        rounds += 1
        new_sig = G._edge_signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        pytest.fail("no convergence in 12 rounds on a 200-chain")
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(60)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _run(spark, edges)
        assert got == _union_find(edges), f"trial {trial}"


def test_duplicate_and_reversed_edges_are_idempotent(spark):
    edges = [(5, 9), (9, 5), (5, 9), (9, 14)]
    got = _run(spark, edges)
    assert got == {5: 5, 9: 5, 14: 5}


def test_dedup_clusters_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a: long, id_b: long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in G.dedup_clusters(pairs).collect()
    }
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_dedup_survivors_policy_and_singletons(spark):
    # clusters {1,2,3} (transitive) and {7,8}; 4 and 5 are singletons
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 99), (5, 1), (7, 5), (8, 5)],
        "doc_id: long, n_chars: long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a: long, id_b: long")
    out = {r["doc_id"]: r for r in G.dedup_survivors(docs, pairs).collect()}
    assert len(out) == 7
    # max n_chars wins; tie (2 vs 3 both 30) broken by smaller id
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    # tie at 5 chars: smaller id 7 survives
    assert out[7]["keep"] and not out[8]["keep"]
    # singletons always survive with themselves as cluster
    for d in (4, 5):
        assert out[d]["keep"] and out[d]["cluster_id"] == d and out[d]["cluster_size"] == 1
    assert out[1]["cluster_id"] == 1 and out[1]["cluster_size"] == 3
    assert sum(1 for r in out.values() if r["keep"]) == 4
