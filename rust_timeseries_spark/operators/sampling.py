"""Deterministic sampling / splitting / sequence packing for
training-data pipelines.

Reference scope note: the reference engine has no sampling surface
(SURVEY §2); these are the graft-added operators a corpus pipeline
needs before any statistics run — a STABLE train/val/test assignment
(adding documents later must not reshuffle earlier assignments, unlike
``df.randomSplit``), rate sampling with the same stability, and greedy
sequence packing into fixed-token-budget bins.

Two hash families, chosen by oracle-ability:

* ``stable_split`` / ``stable_sample`` use Fibonacci multiplicative
  hashing — ``h = (fold(id) * 2654435761) mod 2³²`` with
  ``fold(id) = (id mod 2³¹) XOR (id div 2³¹)`` (Knuth's golden-ratio
  constant; public, designed exactly for scrambling sequential ids;
  the XOR fold keeps high id bits contributing while bounding the
  product inside int64). Pure BIGINT arithmetic both Spark and any SQL
  engine execute identically, so the driver gate has a LIVE SQL
  oracle. Domain: 0 ≤ id < 2⁶² — past it BOTH engines fail loudly
  (ANSI overflow) rather than wrap.
* ``stable_split_xxh`` uses ``F.xxhash64`` for arbitrary / composite /
  string keys at any scale — engine-side only (DuckDB has no xxhash64;
  the pure-Python reimpl in ``functions/xxh64.py`` backs frozen-oracle
  verification if ever gated).

``pack_sequences`` is the LLM training-batch step: documents ordered
within a shard are packed first-fit-contiguous into bins of
``max_tokens`` (a doc longer than the budget gets its own bin). The
fold is non-associative (bin boundaries depend on the running
remainder), so — like the ψ/EWMA recursions — it runs as one
``applyInPandas`` pass per shard with a vectorized inner loop; shards
are hash-assigned so the pattern scales by adding shards, which is
exactly how production packers distribute (order within a shard is the
deterministic contract, order across shards is irrelevant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Knuth's multiplicative constant: floor(2^32 / golden ratio), odd
KNUTH32 = 2654435761
_M32 = 1 << 32


def stable_hash32(id_col) -> "F.Column":
    """Fibonacci multiplicative hash of a non-negative integral id into
    [0, 2³²) — identical integer arithmetic on every SQL engine. The
    31-bit XOR fold keeps the product inside int64 for any id < 2⁶²
    (the sf1 scaledata ids reach 9×10⁹, past the unfolded 3.4×10⁹
    bound)."""
    c = F.col(id_col).cast("long")
    # DIV, not float division: a double quotient loses exactness past
    # 2^53 and this hash must be bit-stable at any id. Identifier is
    # backtick-quoted: names needing quoting (spaces, dots, hyphens)
    # must resolve to the same column F.col sees (r5 advice).
    quoted = id_col.replace("`", "``")
    hi = F.expr(f"CAST(`{quoted}` AS BIGINT) DIV {1 << 31}")
    folded = F.pmod(c, F.lit(1 << 31)).bitwiseXOR(hi)
    return F.pmod(folded * F.lit(KNUTH32), F.lit(_M32))


def stable_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic split label. ``weights`` maps
    label → integer share out of their sum (default train/val/test =
    8/1/1). Adding new rows later never changes existing assignments."""
    weights = weights if weights is not None else {"train": 8, "val": 1, "test": 1}
    total = sum(weights.values())
    slot = F.pmod(stable_hash32(id_col), F.lit(total))
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = (slot >= lo) & (slot < lo + w)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += w
    return df.withColumn(out_col, expr)


def stable_sample(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by id — the same rows
    every run, on every engine, at any partitioning."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.where(stable_hash32(id_col) < int(rate * _M32))


def stable_split_xxh(
    df: DataFrame,
    key_cols: list[str],
    weights: dict[str, int] | None = None,
    out_col: str = "split",
    seed: int = 42,
) -> DataFrame:
    """``stable_split`` for arbitrary/composite/string keys at any
    scale, via xxhash64 (engine-side; no live SQL oracle)."""
    weights = weights if weights is not None else {"train": 8, "val": 1, "test": 1}
    total = sum(weights.values())
    slot = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(total))
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = (slot >= lo) & (slot < lo + w)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += w
    return df.withColumn(out_col, expr)


def stratified_sample_n(
    df: DataFrame,
    n: int,
    keys: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EXACTLY-min(n, group size) rows per group — the
    fixed-size-per-domain sample (eval subsets, per-source spot-check
    panels) that ``stable_sample``'s rate form can't give.

    Rows rank by ``stable_hash32(id)`` (ties by id) within each group,
    keep rank ≤ n: engine-portable (live SQL oracle), and growing a
    group later only displaces rows at the rank-n boundary — never
    reshuffles the whole sample (the property a random ORDER BY lacks).

    One window shuffle on ``keys``. For a group so large its sort is
    the bottleneck (≫10⁸ rows per key), pre-filter with the same hash
    below an over-sampled threshold (e.g. keep hash < 4·n/|group|·2³²)
    and rank the survivors — the two-phase escape documented for
    ``mixture_sample``; rank-boundary determinism is unchanged because
    the prefilter keeps every row the final rank can select."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    keys = keys if keys is not None else ["source"]
    w = Window.partitionBy(*keys).orderBy(
        stable_hash32(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    n_shards: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "shard",
) -> DataFrame:
    """First-fit-contiguous packing: within each shard (hash of id mod
    ``n_shards``), documents in ascending ``id_col`` order fill a bin
    until the next doc would exceed ``max_tokens``, then a new bin
    starts. A single doc longer than the budget occupies its own bin
    (truncation is the caller's policy). Adds ``shard`` and ``bin_id``
    columns.

    Non-associative fold ⇒ one ``applyInPandas`` per shard with a
    vectorized running-remainder loop; the shuffle key is the shard, so
    parallelism = ``n_shards`` regardless of corpus size."""
    if max_tokens <= 0 or n_shards <= 0:
        raise ValueError("max_tokens and n_shards must be positive")
    with_shard = df.withColumn(
        shard_col, F.pmod(stable_hash32(id_col), F.lit(n_shards)).cast("int")
    )
    out_schema = T.StructType(
        [*with_shard.schema.fields, T.StructField("bin_id", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        bins = np.empty(len(toks), dtype=np.int64)
        b, acc = 0, 0
        for i, t in enumerate(toks.tolist()):
            if acc > 0 and acc + t > max_tokens:
                b += 1
                acc = 0
            bins[i] = b
            acc += t
        pdf["bin_id"] = bins
        return pdf

    return with_shard.groupBy(shard_col).applyInPandas(pack, out_schema)


def mixture_sample(
    df: DataFrame,
    budgets: DataFrame,
    tokens_col: str = "n_tokens",
    group_col: str = "source",
    id_col: str = "doc_id",
    budget_col: str = "token_budget",
) -> DataFrame:
    """Deterministic mixture sampling — the "data mixing" step that
    turns per-domain token budgets (the published recipe behind
    Pile/Gopher/Dolma-style training mixes) into a concrete document
    subset: within each group, documents are ranked by
    ``stable_hash32(id)`` (a deterministic uniform order — the same
    docs survive on every run, engine, and partitioning; ``id`` breaks
    hash ties) and the greedy prefix is kept while the tokens consumed
    BEFORE a document stay under the group's budget, so each group
    overshoots by less than one document and smaller corpora are taken
    whole.

    ``budgets`` is a (group, budget) DataFrame — domain maps are
    hundreds of rows, so it broadcast-joins onto the corpus without a
    shuffle of the big side. The plan is one window shuffle: hash
    partition by group + in-partition sort by (hash, id). At 100 TB a
    single giant group serializes its window sort; the scale escape is
    a two-phase prefix — estimate a hash threshold from
    budget/avg_tokens, pre-filter to ~the surviving prefix with the
    embarrassingly-parallel hash predicate, then run this exact window
    on the survivors — same result, window input shrunk by orders of
    magnitude (same pattern as the EWMA giant-key escape hatch).

    Adds ``cum_tokens`` (tokens consumed through this doc, in hash
    order) to the kept rows.
    """
    from pyspark.sql import Window

    h = stable_hash32(id_col).alias("_mx_h")
    w = (
        Window.partitionBy(group_col)
        .orderBy("_mx_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(tokens_col).cast("long")
    joined = df.withColumn("_mx_h", h).join(F.broadcast(budgets), group_col)
    out = (
        joined.withColumn("cum_tokens", F.sum(tok).over(w))
        .where(F.col("cum_tokens") - tok < F.col(budget_col))
        .drop("_mx_h", budget_col)
    )
    return out


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    keys: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis A-ES scheme with HASH-derived uniforms: each
    row gets rank key ``ln(u)/w`` where ``u = (stable_hash32(id)+0.5)
    / 2³²`` and ``w = weight_col > 0``; the top-``n`` keys (per
    ``keys`` stratum if given) are an exact weighted sample, and the
    SAME rows win on every run, engine, and partitioning. Heavier rows
    get proportionally higher inclusion odds (w→∞ ⇒ key→0⁻, the max).

    Plan: one projection + a per-stratum top-n (rank window after a
    hash shuffle on the stratum keys; for the unstratified case a
    single TakeOrderedAndProject — no global sort). ``ln`` is libm
    math, but keys of distinct rows differ at O(key-gap) ≫ cross-libm
    ulp noise, so the selected SET is engine-stable; exact ties are
    broken by id."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # A-ES is defined for w > 0 only. Rows with w <= 0 (or null) are
    # INELIGIBLE and filtered out — the w=0 limit of the scheme is
    # inclusion probability 0, and a negative w would flip the key's
    # sign and outrank every valid row (review r5s4; under ANSI mode a
    # zero weight previously aborted the whole job with DIVIDE_BY_ZERO).
    # NaN must be excluded explicitly: Spark orders NaN above every
    # number, so `w > 0` ALONE passes NaN weights, whose samp_key=NaN
    # then sorts first under desc and displaces valid rows (r5 advice)
    w = F.col(weight_col).cast("double")
    df = df.where((w > 0) & ~F.isnan(w))
    u = (stable_hash32(id_col) + F.lit(0.5)) / F.lit(float(_M32))
    key = F.log(u) / w
    out = df.withColumn("samp_key", key)
    order = [F.desc("samp_key"), F.asc(id_col)]
    if keys:
        w = Window.partitionBy(*keys).orderBy(*order)
        return (
            out.withColumn("samp_rank", F.row_number().over(w))
            .where(F.col("samp_rank") <= n)
        )
    # the rank window sees <= n post-limit rows; pmod(id, 1) = 0 is a
    # constant-per-row, NON-foldable partition key (a bare literal gets
    # constant-folded out and WindowExec then warns about a global
    # window even though the input is bounded)
    grp = F.pmod(F.col(id_col).cast("long"), F.lit(1))
    return out.orderBy(*order).limit(n).withColumn(
        "samp_rank",
        F.row_number().over(Window.partitionBy(grp).orderBy(*order)),
    )
