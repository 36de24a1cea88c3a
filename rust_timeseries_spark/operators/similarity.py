"""Similarity search over embedding columns.

* ``cosine_topk_bruteforce`` — exact top-k per query via a broadcast
  join of the (small) query set against the corpus: the corpus side
  never shuffles, per-partition top-k via window rank. The baseline.
* ``random_hyperplane_buckets`` + ``cosine_topk_lsh`` — the scale path:
  multi-table sign-LSH (L independent tables of b hyperplane bits —
  the standard OR-amplification; collision prob per table
  (1−θ/π)^b, overall 1−(1−p^b)^L). The projection is one numpy GEMM
  per Arrow batch; candidate generation is a bucket join on
  (table, bucket); exact cosine re-rank runs only inside candidates.

Dot products on the JVM side use ``zip_with``/``aggregate`` (no Python
per row); the LSH projection is the only Python stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_col(vec_col: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, scan the corpus
    once, window-rank per query. Plan: BroadcastNestedLoopJoin →
    project (JVM dot) → per-query top-k window."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"), _norm_col(vec_col).alias("cn")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm_col(vec_col).alias("qn")
    )
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
        .select("query_id", "corpus_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def infer_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality via ONE tiny driver action (limit-1
    scan of the array length). Arrays of floats have no static length
    in the schema, so this is the honest fallback when the caller
    can't pass ``dim``; never called inside plan-construction helpers."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("cannot infer dim from an empty DataFrame; pass dim=")
    return int(row[0]["d"])


def random_hyperplane_buckets(
    df: DataFrame,
    n_bits: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH bucket ids: one row per (vector, table) with columns
    ``table`` and ``bucket`` (the b sign bits of that table's seeded
    Gaussian projection). One GEMM per Arrow batch for ALL tables.

    ``dim`` (the embedding dimensionality) must be supplied — plan
    construction is pure (no hidden driver-side action). High-level
    entry points (``cosine_topk_lsh``) may call ``infer_dim`` once,
    which is a documented small driver action."""
    if dim is None:
        raise ValueError(
            "random_hyperplane_buckets requires dim (embedding length); "
            "use similarity.infer_dim(df, vec_col) once at the API boundary "
            "if it is not statically known"
        )
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits * n_tables))
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (mat @ planes) > 0  # (batch, n_bits*n_tables)
        bits = bits.reshape(len(mat), n_tables, n_bits)
        codes = bits @ weights  # (batch, n_tables)
        return pd.Series(list(codes))

    out = df.withColumn("_bkts", _buckets(F.col(vec_col)))
    return out.select(
        "*", F.posexplode("_bkts").alias("table", "bucket")
    ).drop("_bkts")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing any
    (table, bucket) with the query; exact cosine re-rank inside
    candidates. At scale the corpus side is written bucketed by
    (table, bucket) so only the probe side shuffles."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    cb = random_hyperplane_buckets(corpus, n_bits, n_tables, id_col, vec_col, dim=dim, seed=seed).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
        "table",
        "bucket",
    )
    qb = random_hyperplane_buckets(queries, n_bits, n_tables, id_col, vec_col, dim=dim, seed=seed).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_col(vec_col).alias("qn"),
        "table",
        "bucket",
    )
    cands = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("corpus_id"))
        .dropDuplicates(["query_id", "corpus_id"])
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
        .select("query_id", "corpus_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return cands.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer → cell-bucketed probe
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame,
    n_cells: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 8192,
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on a BOUNDED
    deterministic sample (the ``sample_size`` vectors with the smallest
    ``xxhash64(id)`` — stable under repartitioning, unlike
    ``df.sample``). The sample is the only driver-side collect; its
    size is capped regardless of corpus size, so training cost is
    constant at 100 TB. Centroids are L2-normalized every Lloyd
    iteration (assignment by max dot ≡ max cosine); empty cells are
    re-seeded deterministically from the sample. Returns a C-contiguous
    ``(n_cells, dim)`` float64 array."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_size)
        .collect()
    )
    if len(rows) < n_cells:
        raise ValueError(f"need at least n_cells={n_cells} vectors, got {len(rows)}")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    x_unit = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    rng = np.random.default_rng(seed)
    cents = x_unit[rng.choice(len(x_unit), size=n_cells, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x_unit @ cents.T, axis=1)
        for c in range(n_cells):
            members = x_unit[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:  # deterministic re-seed for an empty cell
                cents[c] = x_unit[int(rng.integers(len(x_unit)))]
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
    return np.ascontiguousarray(cents)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cell`` column: each row repeated for its ``nprobe``
    nearest centroids (by cosine). ``nprobe=1`` indexes a corpus (one
    cell per vector); ``nprobe>1`` expands a query for probing. One
    numpy GEMM per Arrow batch against the broadcast centroid matrix —
    the same plan shape as the sign-LSH projection."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    npr = int(nprobe)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = mat @ cents.T  # (batch, n_cells)
        # top-nprobe cells, deterministic: sort by (-sim, cell)
        order = np.lexsort((np.arange(sims.shape[1])[None, :].repeat(len(mat), 0), -sims), axis=1)
        top = order[:, :npr].astype(np.int32)
        return pd.Series(list(top))

    return (
        df.withColumn("_cells", _cells(F.col(vec_col)))
        .select("*", F.explode("_cells").alias("cell"))
        .drop("_cells")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in exactly one
    k-means cell; each query probes its ``nprobe`` nearest cells; exact
    cosine re-rank runs only inside probed cells. ``nprobe == n_cells``
    degenerates to exact brute force (the oracle identity the driver
    gate checks). At scale the corpus is written partitioned by
    ``cell`` so a probe touches nprobe/n_cells of the data and only the
    (small) query side shuffles."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells, dim, vec_col=vec_col, id_col=id_col, seed=seed
        )
    cb = ivf_assign(corpus, centroids, nprobe=1, vec_col=vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
        "cell",
    )
    qb = ivf_assign(queries, centroids, nprobe=nprobe, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_col(vec_col).alias("qn"),
        "cell",
    )
    cands = (
        qb.join(cb, ["cell"])
        .where(F.col("query_id") != F.col("corpus_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
        .select("query_id", "corpus_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return cands.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# distributed Lloyd k-means (full-corpus clustering, fixed iterations)
# ---------------------------------------------------------------------------

def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray]:
    """Distributed Lloyd k-means over the FULL corpus (unlike
    ``train_ivf_centroids``, whose quantizer trains on a bounded
    sample): a fixed number of deterministic iterations for embedding-
    space corpus clustering (semantic bucketing of training data).

    * Init: the ``k`` vectors with the smallest ids (deterministic,
      engine-independent; a bounded ``orderBy(id).limit(k)`` collect).
    * Assignment: one numpy squared-L2 matrix per Arrow batch against
      the broadcast ``(k, dim)`` centroid matrix — the sign-LSH/IVF
      plan shape, scan-speed over any corpus size. Ties (measure-zero
      for real embeddings) break to the lowest cluster id via argmin.
    * Update: posexplode to ``(cluster, dim_idx, val)`` and a
      partial-aggregating groupBy — the shuffle carries k·dim partial
      sums per map task, not vectors — then a bounded k·dim collect
      feeds the next broadcast. No driver-side data-proportional work.

    Returns ``(assignments, centroids)``: per-row ``id_col, cluster,
    sq_dist`` plus the final float64 ``(k, dim)`` centroid array.
    """
    if k < 1 or n_iters < 1:
        raise ValueError(f"k and n_iters must be >= 1, got k={k}, n_iters={n_iters}")
    seed_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    cents = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
    dim = cents.shape[1]

    def _assign(centroids: np.ndarray) -> DataFrame:
        c = np.ascontiguousarray(centroids)

        @F.pandas_udf(T.StructType([
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sq_dist", T.DoubleType()),
        ]))
        def _arg(vecs: pd.Series) -> pd.DataFrame:
            if len(vecs) == 0:
                return pd.DataFrame({"cluster": pd.Series([], dtype="int32"),
                                     "sq_dist": pd.Series([], dtype="float64")})
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            # (B, k, dim) diff tensor: exact (x−c)² sums — numerically the
            # same formula the SQL oracle spells out, no |x|²−2x·c rewrite
            d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            amin = d2.argmin(axis=1)
            return pd.DataFrame({
                "cluster": amin.astype("int32"),
                "sq_dist": d2[np.arange(len(mat)), amin],
            })

        a = df.select(F.col(id_col), F.col(vec_col), _arg(F.col(vec_col)).alias("_a"))
        return a.select(id_col, vec_col, F.col("_a.cluster").alias("cluster"),
                        F.col("_a.sq_dist").alias("sq_dist"))

    for _ in range(n_iters - 1):
        assigned = _assign(cents)
        sums = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim_idx", "val"))
            .groupBy("cluster", "dim_idx")
            .agg(F.sum(F.col("val").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()  # empty cluster keeps its previous centroid
        acc = np.zeros((k, dim)), np.zeros(k)
        for r in sums:
            acc[0][r["cluster"], r["dim_idx"]] = r["s"]
            acc[1][r["cluster"]] = r["n"]
        nonempty = acc[1] > 0
        new[nonempty] = acc[0][nonempty] / acc[1][nonempty, None]
        cents = new
    return _assign(cents).drop(vec_col), cents
