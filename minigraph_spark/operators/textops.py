"""Text analysis operators over a documents table (doc_id, text).

Language-ID (marker-token heuristic), quality scoring, token counting,
document fingerprinting — all pure built-in-function expressions (JVM-side,
whole-stage codegen; no UDFs), each with an exact SQL oracle. Definitions
are deliberately simple and fully specified so they are cross-engine
reproducible; swap in richer models behind the same column contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker stopword sets per language — tiny fixed lists; argmax of marker
# hits decides, ties -> 'und'. (A real n-gram LID model slots in behind the
# same (doc_id, lang_pred) contract via a pandas UDF.)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "qy": ["query", "row", "column", "table"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokens. Defined as
    count(' ') + 1 on the single-space-separated text (cross-engine exact);
    empty/null text counts 0."""
    t = F.col(text_col)
    n = F.when(
        t.isNull() | (F.length(F.trim(t)) == 0), F.lit(0)
    ).otherwise(F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1)
    return docs.select("doc_id", n.cast("long").alias("n_tokens"))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len) — the
    building blocks of quality scoring, via explode (scales linearly)."""
    tok = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("t"))
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_distinct_tokens"),
        F.round(F.avg(F.length("t")), 6).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ttr, stopword_ratio, quality) — type-token ratio,
    stopword fraction, and a blended 0..1 quality score:
    quality = 0.7*ttr + 0.3*(1 - |stopword_ratio - 0.4|)."""
    tok = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("t"))
    agg = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("t").alias("nd"),
        F.sum(F.when(F.col("t").isin(STOPWORDS), 1).otherwise(0)).alias("nstop"),
    )
    ttr = F.col("nd").cast("double") / F.col("n").cast("double")
    sr = F.col("nstop").cast("double") / F.col("n").cast("double")
    quality = F.lit(0.7) * ttr + F.lit(0.3) * (F.lit(1.0) - F.abs(sr - F.lit(0.4)))
    return agg.select(
        "doc_id",
        F.round(ttr, 6).alias("ttr"),
        F.round(sr, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — argmax of per-language marker-token hits;
    'und' when no language strictly wins."""
    tok = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("t"))
    counts = [
        F.sum(F.when(F.col("t").isin(words), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    agg = tok.groupBy("doc_id").agg(*counts)
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    # strict argmax: lang wins iff its count strictly exceeds all others
    for lang in langs:
        others = [F.col(f"c_{o}") for o in langs if o != lang]
        cond = F.col(f"c_{lang}") > F.lit(0)
        for o in others:
            cond = cond & (F.col(f"c_{lang}") > o)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return agg.select("doc_id", pred.alias("lang_pred"))
