"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design: every stage that touches all N documents is expressed as
JVM column math (shingling, per-permutation min-hashing, band hashing)
so dedup runs at scan speed; only SimHash uses an Arrow-vectorized
pandas UDF (bit-count math is numpy-friendlier than expression trees).
Candidate generation is always hash-bucket joins (shuffle on band/
bucket keys — the classic MinHash-LSH plan), never an N² cross join;
exact pairwise verification runs only inside candidate buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textops import words_col


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: keep the smallest id per
    hash (deterministic winner), count the rest. Hash-shuffle on the
    digest — one pass."""
    h = F.md5(F.col(text_col))
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .withColumn("n_dupes", F.col("n_copies") - 1)
        .drop("_h")
    )


def shingles(text_col: str = "text", k: int = 3):
    """k-word shingles as strings — JVM transform over the word array."""
    words = words_col(text_col)
    n = F.size(words)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(shingle, seed+i). Pure column expressions — one projection
    computes all ``num_perm`` permutations."""
    sh = shingles(text_col, shingle_k)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed + i))))
            for i in range(num_perm)
        ]
    )
    return df.select(id_col, sig.alias("minhash"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signatures (b×r), hash each band, bucket-join: documents
    sharing any band bucket become candidate pairs. The only shuffle is
    on (band, band_hash); bucket sizes are bounded by collision rate,
    not N."""
    banded = sig_df.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("minhash", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band buckets →
    candidate pairs → estimated Jaccard (signature agreement) filter."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k, seed)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    sa = sigs.withColumnRenamed(id_col, "id_a").withColumnRenamed("minhash", "sig_a")
    sb = sigs.withColumnRenamed(id_col, "id_b").withColumnRenamed("minhash", "sig_b")
    est = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    lambda v: v == 1,
                )
            ).cast("double")
            / F.lit(num_perm),
        )
        .select("id_a", "id_b", "est_jaccard")
    )
    return est.where(F.col("est_jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    shingle_k: int = 1,
) -> DataFrame:
    """Exact n-gram Jaccard for all within-group pairs via an inverted
    index join (word → docs), not a cross join. Suitable as LSH's
    verification stage or for modest group sizes."""
    sh = F.array_distinct(shingles(text_col, shingle_k))
    gcols = [group_col] if group_col else []
    toks = df.select(id_col, *gcols, F.explode(sh).alias("tok"))
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    cond = (F.col("a.tok") == F.col("b.tok")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    if group_col:
        cond = cond & (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes).withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(F.broadcast(sizes).withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("union_sz"))
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash — Arrow-vectorized (bit math in numpy)
# ---------------------------------------------------------------------------

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash64_str(words: list[str]) -> np.ndarray:
    """Deterministic per-token 64-bit hashes (FNV-1a, numpy uint64)."""
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = np.uint64(0xCBF29CE484222325)
        for ch in w.encode("utf-8"):
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def simhash_np(words: list[str]) -> int:
    """64-bit SimHash of a token list: per-bit vote of token hashes."""
    if not words:
        return 0
    hs = _hash64_str(words)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sim = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            sim |= np.uint64(1) << np.uint64(b)
    return int(sim)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """SimHash column via an Arrow-batched pandas UDF (returns the
    unsigned value reinterpreted as signed int64 for a LongType col)."""

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        vals = [simhash_np(t.split(" ") if t else []) for t in texts]
        return pd.Series(np.array(vals, dtype=np.uint64).view(np.int64))

    return df.withColumn("simhash", _simhash(F.col(text_col)))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 4 16-bit chunks (a pair
    within Hamming distance ≤ 3·16/…, by pigeonhole any pair with ≤ 3
    differing chunks collides in ≥ 1 chunk), verify Hamming distance
    with bit_count on the XOR. Bucket-join, no cross join."""
    sh = with_simhash(df) if "simhash" not in df.columns else df
    chunks = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)])
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    )
    return pairs.where(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    group_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: normalized dot product via
    ``F.zip_with`` + ``F.aggregate`` (JVM). Pairs come from a group
    restriction (or the full cross join for small inputs); at scale,
    bucket first with ``similarity.random_hyperplane_buckets``."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        *([group_col] if group_col else []),
        F.col(vec_col).alias("v"),
        norm.alias("nrm"),
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if group_col:
        cond = cond & (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
    dot = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
