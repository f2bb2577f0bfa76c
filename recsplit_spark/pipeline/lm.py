"""Unigram LM quality scoring (the CCNet shape, Wenzek et al. 2019):
score documents by how "expected" their words are under a corpus (or
reference-corpus) unigram model, the workhorse perplexity-style filter
of LLM data pipelines.

Two passes, both canonical Spark shapes:

1. **Model pass** — ``word_counts`` is the word-count job (explode +
   hash aggregate; the shuffle carries only per-partition DISTINCT
   words thanks to partial aggregation, not the exploded rows);
   ``top_vocab`` caps it to the ``vocab_size`` most frequent words at
   ``min_count+`` (TakeOrdered — no global sort), which bounds what the
   score pass must broadcast no matter the corpus size.
2. **Score pass** — ``with_unigram_stats`` explodes each doc's words,
   broadcast-joins the capped vocab, and re-aggregates per doc. Words
   never leave their input partition until the per-doc partial rows
   (one per doc per partition) shuffle, so the exchange is O(docs) * a
   few ints, not O(words). Outputs are exact integers (``n_words``,
   ``n_oov``, ``sum_count`` — total corpus frequency of the doc's
   in-vocab words) plus the float ``mean_log2p`` (mean per-word log2
   probability under the vocab model, OOV words at the floor
   probability 1/(total+vocab+1) — additive-smoothing's unseen mass).

Words are single-space splits — the same tokenization contract as
text.py quality counts and the Gopher rules, so scores compose with
those filters on identical word boundaries.

The bigram surface (``bigram_counts`` / ``top_bigrams`` /
``with_bigram_stats``) extends the same two-pass shape to adjacent
word pairs with Jelinek-Mercer interpolation against the unigram
model: the model pass produces a second capped table (pairs instead
of words, same deterministic cut), and the score pass adds two more
broadcast lookups to the same explode-and-reaggregate scan — still
one O(docs) exchange, never an O(words) one.

No reference analogue (minperf is an MPHF library); task-brief surface
("text analysis: quality scoring").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "top_vocab",
    "with_unigram_stats",
    "bigram_counts",
    "top_bigrams",
    "with_bigram_stats",
]


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def _pairs(text_col: str):
    """array<struct<w1, w2>> of adjacent word pairs (empty for docs with
    < 2 words — the slice lengths floor at 0)."""
    w = _words(text_col)
    n = F.size(w)
    return F.arrays_zip(
        F.slice(w, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(w, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``DataFrame[word, count]`` over single-space words. The explode
    feeds a hash aggregate whose map-side combine reduces the exchange
    to per-partition distinct words."""
    return (
        df.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def top_vocab(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 65536,
    min_count: int = 2,
) -> DataFrame:
    """The ``vocab_size`` most frequent words with ``count >=
    min_count`` — deterministic (count desc, word asc tie-break), via
    limit-pushdown (TakeOrdered), never a global sort."""
    return (
        word_counts(df, text_col)
        .filter(F.col("count") >= F.lit(int(min_count)))
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(int(vocab_size))
    )


def with_unigram_stats(
    df: DataFrame,
    text_col: str,
    vocab: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc unigram stats vs a ``[word, count]`` vocab table:
    ``n_words``/``n_oov``/``sum_count`` (exact integers) and
    ``mean_log2p`` (mean log2 word probability, additive-smoothed:
    in-vocab word w -> (count_w + 1) / (total + V + 1), OOV ->
    1 / (total + V + 1)). The vocab is broadcast (capped upstream by
    ``top_vocab``); every other column of ``df`` is preserved."""
    totals = vocab.agg(
        F.sum("count").alias("t"), F.count("*").alias("v")
    ).collect()[0]
    total, v = int(totals["t"] or 0), int(totals["v"])
    denom = float(total + v + 1)

    words = df.select(id_col, F.explode(_words(text_col)).alias("word"))
    joined = words.join(F.broadcast(vocab), "word", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum(F.col("count").isNull().cast("long")).alias("n_oov"),
        F.sum(F.coalesce(F.col("count"), F.lit(0))).alias("sum_count"),
        (
            F.sum(F.log2((F.coalesce(F.col("count"), F.lit(0)) + 1) / denom))
            / F.count("*")
        ).alias("mean_log2p"),
    )
    return df.join(per_doc, id_col, "left")


def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``DataFrame[w1, w2, count]`` over adjacent single-space word
    pairs — the same explode-into-partial-agg shape as ``word_counts``
    (the exchange carries per-partition DISTINCT pairs)."""
    return (
        df.select(F.explode(_pairs(text_col)).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("count"))
    )


def top_bigrams(
    df: DataFrame,
    text_col: str,
    table_size: int = 1 << 20,
    min_count: int = 2,
) -> DataFrame:
    """The ``table_size`` most frequent adjacent pairs with ``count >=
    min_count`` — deterministic (count desc, then (w1, w2) asc), via
    TakeOrdered like ``top_vocab``; caps what the score pass
    broadcasts no matter the corpus size."""
    return (
        bigram_counts(df, text_col)
        .filter(F.col("count") >= F.lit(int(min_count)))
        .orderBy(
            F.col("count").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(int(table_size))
    )


def with_bigram_stats(
    df: DataFrame,
    text_col: str,
    vocab: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Per-doc interpolated-bigram stats (Jelinek-Mercer smoothing):
    ``P(w2 | w1) = lam * c(w1,w2)/c(w1) + (1-lam) * P_uni(w2)`` with the
    bigram term backing off to 0 whenever the pair or its left word
    fell outside the capped tables, and ``P_uni`` the same
    additive-smoothed unigram as ``with_unigram_stats`` — so the score
    is strictly positive and a doc of unseen text floors at
    ``(1-lam)/(total+V+1)``.

    Plan shape: one explode of the doc's pairs, TWO broadcast joins
    (the capped bigram table on (w1, w2); the capped vocab once per
    side for c(w1) and c(w2)), one per-doc re-aggregation — words
    never shuffle, only the O(docs) partial rows do. Outputs: exact
    integers ``n_bigrams`` / ``n_bigram_hits`` (pairs found in the
    table with an in-vocab left word) and the float
    ``mean_log2p_bigram`` (null for docs with < 2 words).

    The capped vocab is materialized ONCE (it is driver-sized by the
    ``top_vocab`` contract — it gets broadcast anyway) and reused for
    the totals and both lookup sides, so an uncached ``vocab`` argument
    does not re-run its word-count shuffle three times."""
    if not 0.0 < lam < 1.0:
        raise ValueError(
            f"lam must be in (0, 1) (got {lam}): lam=1 makes unseen "
            "pairs log2(0) and lam=0 is with_unigram_stats"
        )
    spark = df.sparkSession
    vrows = vocab.select("word", "count").collect()
    total = sum(int(r["count"]) for r in vrows)
    v = len(vrows)
    denom = float(total + v + 1)

    pairs = df.select(
        id_col, F.explode(_pairs(text_col)).alias("p")
    ).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bg = F.broadcast(
        bigrams.select("w1", "w2", F.col("count").alias("c12"))
    )
    v1 = F.broadcast(
        spark.createDataFrame(vrows, vocab.schema).select(
            F.col("word").alias("w1"), F.col("count").alias("c1")
        )
    )
    v2 = F.broadcast(
        spark.createDataFrame(vrows, vocab.schema).select(
            F.col("word").alias("w2"), F.col("count").alias("c2")
        )
    )
    j = (
        pairs.join(bg, ["w1", "w2"], "left")
        .join(v1, "w1", "left")
        .join(v2, "w2", "left")
    )
    hit = F.col("c12").isNotNull() & F.col("c1").isNotNull()
    p_uni2 = (F.coalesce(F.col("c2"), F.lit(0)) + 1) / F.lit(denom)
    p = (
        F.when(hit, F.lit(lam) * F.col("c12") / F.col("c1")).otherwise(0.0)
        + F.lit(1.0 - lam) * p_uni2
    )
    per_doc = j.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum(hit.cast("long")).alias("n_bigram_hits"),
        (F.sum(F.log2(p)) / F.count("*")).alias("mean_log2p_bigram"),
    )
    return df.join(per_doc, id_col, "left")
