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

No reference analogue (minperf is an MPHF library); task-brief surface
("text analysis: quality scoring").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "top_vocab", "with_unigram_stats"]


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


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
