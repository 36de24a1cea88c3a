"""BM25 top-k vs a straightforward pure-Python reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from rust_timeseries_spark.operators import retrieval


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    tfs = {i: Counter(t.split(" ")) for i, t in docs}
    dls = {i: len(t.split(" ")) for i, t in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    df = Counter()
    for c in tfs.values():
        for term in c:
            df[term] += 1
    out = {}
    for qid, q in queries:
        for i, _ in docs:
            s = 0.0
            for term in sorted(set(q.split(" "))):
                tf = tfs[i][term]
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            if s > 0.0:
                out[(qid, i)] = s
    return out


def test_bm25_matches_reference(spark):
    docs = [
        (0, "spark join table join"),
        (1, "table scan fast table table"),
        (2, "window sort merge window"),
        (3, "spark spark spark"),
        (4, "unrelated words entirely"),
    ]
    queries = [(1, "spark join"), (2, "table window")]
    ddf = spark.createDataFrame(docs, "doc_id: long, text: string")
    qdf = spark.createDataFrame(queries, "query_id: long, query: string")
    got = retrieval.bm25_topk(ddf, qdf, k=5).collect()
    exp = _py_bm25(docs, queries)

    assert {(r["query_id"], r["doc_id"]) for r in got} == set(exp)
    for r in got:
        assert r["score"] == pytest.approx(exp[(r["query_id"], r["doc_id"])], rel=1e-12)
    # ranks are dense 1..n per query, ordered by score desc
    for qid in (1, 2):
        rows = sorted((r for r in got if r["query_id"] == qid), key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert all(rows[i]["score"] >= rows[i + 1]["score"] for i in range(len(rows) - 1))


def test_bm25_k_truncates_and_ties_break_by_doc_id(spark):
    # ten identical docs -> identical scores; rank order must be doc_id
    docs = [(i, "alpha beta") for i in range(10)]
    ddf = spark.createDataFrame(docs, "doc_id: long, text: string")
    qdf = spark.createDataFrame([(1, "alpha")], "query_id: long, query: string")
    got = sorted(retrieval.bm25_topk(ddf, qdf, k=4).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3]
