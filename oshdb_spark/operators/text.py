"""Text-analysis operators for training-data pipelines.

All JVM-side Catalyst expressions (length/replace/split/md5) — these run in
whole-stage codegen with zero Python on the hot path, which is what makes
them viable over 10^12 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_count_col(text_col: str = "text"):
    """Whitespace token count via character arithmetic (exact for
    single-space-separated text; no regex, no UDF)."""
    t = F.col(text_col)
    return (F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1).cast("long")


def token_stats(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per group: doc count, total tokens, total chars, distinct 64-char
    prefix fingerprints (rolling-hash-style document fingerprint)."""
    fingerprint = F.substring(
        F.md5(F.substring(F.col("text"), 1, 64).cast("binary")), 1, 8
    )
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col()).cast("long").alias("sum_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct(fingerprint).alias("n_fingerprints"),
    )


def stopword_score(
    docs: DataFrame, stopword: str = "the", group_col: str = "lang"
) -> DataFrame:
    """Per group: total stopword occurrences (replace-length trick) and
    total chars — the n-gram language-ID heuristic's core counters."""
    t = F.col("text")
    hits = (F.length(t) - F.length(F.expr(f"replace(text, '{stopword}', '')"))) / len(
        stopword
    )
    return docs.groupBy(group_col).agg(
        F.sum(hits).cast("long").alias("stopword_hits"),
        F.sum(F.length(t)).cast("long").alias("total_chars"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, mean token length,
    type-token ratio (distinct/total tokens). JVM-side only."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (F.length(F.col(text_col)).cast("double") / n).alias("mean_tok_len"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias("type_token_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts.

    A tiny n-gram/stopword profile per language — the classic fasttext-free
    fallback; extend the profile table to add languages.
    """
    profiles = {
        "en": ["the", "and", "of"],
        "de": ["der", "und", "nicht"],
        "fr": ["le", "et", "les"],
    }
    t = F.col(text_col)
    scores = []
    for lang, words in profiles.items():
        s = None
        for w in words:
            hits = (F.length(t) - F.length(F.expr(f"replace({text_col}, '{w}', '')"))) / len(w)
            s = hits if s is None else s + hits
        scores.append(F.struct(s.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return docs.select("doc_id", best["lang"].alias("lang_pred"), best["score"].alias("lang_score"))
