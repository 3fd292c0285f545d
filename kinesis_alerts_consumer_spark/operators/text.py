"""Text-analysis operators over ``documents`` — token counting,
quality scoring, language-ID heuristic, fingerprinting. All built-in
column functions; at 100 TB these are narrow maps over the scan plus
one low-cardinality aggregate where noted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread_for_compute

# Tiny per-language stopword profiles for the n-gram/stopword
# language-ID heuristic. Deterministic and SQL-expressible.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "在", "了", "不"),
}

_PUNCT_RE = r"[\.,;:!\?'\"()\[\]{}-]"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics: whitespace tokens, distinct tokens,
    chars, mean token length (BPE-ish proxy: alnum runs)."""
    docs = spread_for_compute(docs)
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
        # BPE-ish proxy: alnum runs + individual punctuation marks —
        # the sub-word unit count a byte-pair tokenizer's pre-tokenizer
        # would see (real BPE plugs in via pandas_udf if needed).
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"), 0
            )
        ).alias("n_subtokens"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality heuristics: stopword ratio, punctuation ratio,
    repetition (1 - distinct/total), composite score. The score is an
    explicit arithmetic expression so it is portable to the oracle."""
    docs = spread_for_compute(docs)
    toks = _tokens(F.col("text"))
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), _PUNCT_RE, "")
    )
    repetition = F.lit(1.0) - F.size(F.array_distinct(toks)) / n
    stop_ratio = n_stop / n
    punct_ratio = n_punct / F.length("text")
    score = (
        F.lit(1.0)
        - F.least(repetition, F.lit(1.0)) * 0.5
        - F.least(punct_ratio * 10, F.lit(1.0)) * 0.2
        + F.least(stop_ratio * 2, F.lit(0.3))
    )
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(repetition, 6).alias("repetition"),
        F.round(score, 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID: the language whose stopword set
    hits the most tokens wins; ties break lexicographically; zero hits
    -> 'und'. (The fixture text is synthetic word soup, so this
    demonstrates the mechanism — on real corpora swap in real
    profiles or a fastText-style model via pandas_udf.)"""
    docs = spread_for_compute(docs)
    toks = _tokens(F.col("text"))
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # max by (hits, then lexicographically smallest lang on ties):
    # array_max on struct compares fields in order, so negate nothing —
    # sort by hits desc handled via array_sort + element_at.
    arr = F.array(*scores)
    best = F.element_at(
        F.array_sort(
            arr,
            lambda l, r: F.when(l.getField("hits") > r.getField("hits"), F.lit(-1))
            .when(l.getField("hits") < r.getField("hits"), F.lit(1))
            .when(l.getField("lang") < r.getField("lang"), F.lit(-1))
            .when(l.getField("lang") > r.getField("lang"), F.lit(1))
            .otherwise(F.lit(0)),
        ),
        1,
    )
    return docs.select(
        "doc_id",
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
        best.getField("hits").cast("bigint").alias("hits"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase
    text (exact-dup key) and a prefix hash of the first 8 tokens
    (rolling-hash analogue for clustering near-identical heads)."""
    docs = spread_for_compute(docs)
    normalized = F.lower(
        F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    )
    toks = _tokens(F.col("text"))
    prefix = F.concat_ws(" ", F.slice(toks, 1, 8))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.md5(F.lower(prefix)).alias("prefix_fp"),
    )


def corpus_profile(docs: DataFrame) -> DataFrame:
    """Per (lang, source) corpus rollup — the aggregate view a data
    curator reads first. One low-cardinality shuffle."""
    toks = _tokens(F.col("text"))
    return (
        docs.select("lang", "source", F.size(toks).alias("n"), F.length("text").alias("c"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n").alias("tokens"),
            F.round(F.avg("n"), 6).alias("avg_tokens"),
            F.round(F.avg("c"), 6).alias("avg_chars"),
        )
    )
