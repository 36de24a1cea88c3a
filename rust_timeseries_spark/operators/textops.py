"""Text-analysis operators for training-data pipelines.

Everything here stays JVM-side (built-in ``pyspark.sql.functions``
column expressions inside whole-stage codegen) — no Python in the row
path, so these run at full scan speed over 100 TB document tables:

* token counting — whitespace tokens and a BPE-ish regex tokenization;
* quality scoring — length / punctuation / stopword / repetition ratios;
* language ID — stopword-hit n-gram heuristic over a small per-language
  lexicon (broadcast as literal arrays);
* document fingerprinting — 64-bit content hash + order-insensitive
  bag-of-words hash for near-canonical dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
# (a simplified GPT-2-style pattern using Java regex classes).
BPE_SPLIT_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# tiny per-language stopword lexicons for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "que", "de", "es", "un", "una", "por", "para"],
}


def words_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + regex token counts, distinct counts, type-token
    ratio. One projection, fully codegen'd."""
    words = words_col(text_col)
    bpe = F.expr(f"regexp_extract_all({text_col}, '{BPE_SPLIT_PATTERN}', 0)")
    return (
        df.withColumn("n_ws_tokens", F.size(words).cast("long"))
        .withColumn("n_bpe_tokens", F.size(bpe).cast("long"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(words)).cast("long"))
        .withColumn("ttr", F.col("n_distinct_tokens").cast("double") / F.col("n_ws_tokens"))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    mean word length sanity, stopword ratio, alphabetic ratio,
    duplicate-word ratio. Pure column math."""
    words = words_col(text_col)
    n_words = F.size(words)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(words, en_stop))
    dup_ratio = 1.0 - F.size(F.array_distinct(words)).cast("double") / n_words
    mean_word_len = (n_chars - (n_words - 1)).cast("double") / n_words
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_frac = n_stop.cast("double") / F.lit(len(LANG_STOPWORDS["en"]))
    score = (
        0.3 * word_len_ok
        + 0.3 * alpha_ratio
        + 0.2 * stop_frac
        + 0.2 * (1.0 - dup_ratio)
    )
    return (
        df.withColumn("mean_word_len", mean_word_len)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", n_punct.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn("dup_word_ratio", dup_ratio)
        .withColumn("quality_score", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: count per-language lexicon hits in the
    word multiset, pick the argmax (ties → lexicographic via the
    ordered greatest chain); 'und' (undetermined) when no lexicon hits.
    """
    words = words_col(text_col)
    hit_cols = []
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        lex = F.array(*[F.lit(w) for w in stops])
        hits = F.size(F.filter(words, lambda w: F.array_contains(lex, w)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*hit_cols) if len(hit_cols) > 1 else hit_cols[0]
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_hits", best["hits"].cast("long"))


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two 64-bit fingerprints:

    * ``fp_exact`` — xxhash64 of the normalized text (case-folded,
      whitespace-collapsed): catches trivially-reformatted duplicates;
    * ``fp_bag`` — xxhash64 of the sorted distinct word list: catches
      word-order shuffles (an order-insensitive rolling-hash analogue).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    bag = F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " ")
    return df.withColumn("fp_exact", F.xxhash64(norm)).withColumn("fp_bag", F.xxhash64(bag))
