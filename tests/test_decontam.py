"""ngram_overlap decontamination vs hand-computed fixtures."""

from __future__ import annotations

from rust_timeseries_spark.operators import decontam


def _rows(df):
    return {r["doc_id"]: (r["n_ngrams"], r["n_hit"], r["contaminated"]) for r in df.collect()}


def test_basic_overlap(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w q")], "doc_id: long, text: string"
    )
    ev = spark.createDataFrame(
        [
            (10, "a b c d e f"),   # grams(3): abc bcd cde def — first 3 hit
            (11, "p q r s"),        # pqr qrs — no hits
        ],
        "doc_id: long, text: string",
    )
    got = _rows(decontam.ngram_overlap(ev, train, n=3))
    assert got == {10: (4, 3, 1), 11: (2, 0, 0)}


def test_short_doc_keeps_row(spark):
    train = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    ev = spark.createDataFrame([(10, "a b")], "doc_id: long, text: string")
    got = _rows(decontam.ngram_overlap(ev, train, n=3))
    assert got == {10: (0, 0, 0)}


def test_duplicate_grams_counted_once(spark):
    # eval doc repeats the same 2-gram; distinct grams counted once
    train = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    ev = spark.createDataFrame([(10, "a b a b a b")], "doc_id: long, text: string")
    got = _rows(decontam.ngram_overlap(ev, train, n=2))
    # distinct 2-grams of "a b a b a b": "a b", "b a" → one hits
    assert got == {10: (2, 1, 1)}
