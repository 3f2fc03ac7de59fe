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


def tfidf_topk(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, score, rank) — top-k salient terms per document by
    tf x inverse document frequency.

    idf here is the RAW rational inverse frequency N/df (not log-scaled):
    the ranking inside a document is identical for any monotone transform
    of idf, and a rational score keeps the oracle cross-engine exact
    (log/ln may differ between libm implementations in the last ulp, which
    a 6-dp round can flip at a boundary). Swap in log scaling behind the
    same contract if absolute scores must be comparable across corpora.

    All built-ins, three shuffles (tf group, df group, per-doc top-k
    window): explode -> count per (doc, term) -> distinct-doc count per
    term -> score join -> row_number window capped at k. The window
    partitions by doc_id — bounded by per-doc vocabulary, no global sort.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n")).collect()[0]["n"]
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * F.lit(float(n_docs)) / F.col("df"), 6).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.desc("tf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, session_seq) — gap-based sessionization: a new
    session starts when the time since the user's previous event exceeds
    ``gap_seconds``. session_seq is the 0-based session index within the
    user (cumulative sum of session-start flags over the user's timeline).

    One shuffle (the per-user window); ties on ts break by event id, the
    same total order the seq-edge projection uses. The classic
    transcript/event preprocessing step before per-session aggregation or
    the conversation->graph projection."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # timestamp-minus-timestamp interval compare: exact to the microsecond,
    # timezone-free (works on TIMESTAMP_NTZ), and identical semantics in the
    # SQL oracle's `ts - lag(ts) > INTERVAL`; two selects because a window
    # result can't feed another window expression in the same projection
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (
            (F.col(ts_col) - prev_ts)
            > F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = events.select(id_col, user_col, ts_col, new_sess.alias("_new"))
    cum = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.select(
        id_col,
        user_col,
        (F.sum("_new").over(cum) - 1).cast("long").alias("session_seq"),
    )


def bigram_topk(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """(bigram, cnt, rank): the k most frequent adjacent-token pairs across
    the corpus — the vocabulary-building step of a BPE-ish tokenizer
    pipeline (pair statistics are the merge-rule candidates). Tokenization
    is the engine-wide single-space convention (token_count/tfidf_topk).

    Scale shape: bigrams are formed IN-ROW (zip_with over two slices of the
    token array — no self-join, no posexplode shuffle), then one count
    aggregation that collapses map-side, then a TakeOrderedAndProject
    top-k (per-partition heads + driver merge of k rows, not a global
    sort). Deterministic total order: cnt desc, bigram asc. Documents with
    fewer than two tokens contribute nothing."""
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1), F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counts = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), "bigram").limit(k)
    w = Window.orderBy(F.desc("cnt"), "bigram")
    return top.withColumn("rank", F.row_number().over(w))


def interarrival_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, n_events, n_gaps, min_gap_s, max_gap_s, avg_gap_s) —
    per-user inter-arrival statistics over the event timeline: gap = whole
    seconds between consecutive events of the same user (epoch-second
    difference, exact integers; ties on ts break by event id, the engine's
    standard total order). Users with a single event report n_gaps=0 and
    NULL gap stats.

    The tempo profile behind sessionize()'s gap threshold — this is how
    SESSION_GAP_SECONDS was calibrated — and the standard activity-cadence
    feature for churn/abuse models. One shuffle (the per-user window) plus
    a map-side-collapsing aggregation; avg is rounded to 6dp for
    cross-engine float parity."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; the NTZ->TZ cast is
    # wall-clock identity under the engine's UTC session tz, and the long
    # cast then floors to whole epoch seconds (microsecond floorDiv)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    gap = (sec - F.lag(sec).over(w)).alias("_gap")
    return (
        events.select(user_col, gap)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_gap").alias("n_gaps"),
            F.min("_gap").alias("min_gap_s"),
            F.max("_gap").alias("max_gap_s"),
            F.round(F.avg("_gap"), 6).alias("avg_gap_s"),
        )
    )
