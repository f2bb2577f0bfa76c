import math
from collections import Counter

import pytest

from recsplit_spark.pipeline.lm import top_vocab, with_unigram_stats, word_counts

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog and a bird"),
    (3, "zyxwvut qqqq zzz"),  # all singletons -> OOV at min_count=2
    (4, ""),  # '' is one word (single-space split contract)
    (5, "the the the"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)


def _counter():
    c = Counter()
    for _, t in DOCS:
        c.update(t.split(" "))
    return c


def test_word_counts_exact(spark, docs_df):
    got = {r["word"]: r["count"] for r in word_counts(docs_df, "text").collect()}
    assert got == dict(_counter())


def test_top_vocab_cap_and_tiebreak(spark, docs_df):
    c = _counter()
    want_full = sorted(
        ((w, n) for w, n in c.items() if n >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )
    got = [(r["word"], r["count"]) for r in top_vocab(docs_df, "text").collect()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want_full
    # the cap cuts at the SAME (count desc, word asc) order both engines use
    got3 = [
        (r["word"], r["count"])
        for r in top_vocab(docs_df, "text", vocab_size=3).collect()
    ]
    assert got3 == want_full[:3]


def test_unigram_stats_match_reference(spark, docs_df):
    c = _counter()
    vocab = {w: n for w, n in c.items() if n >= 2}
    total, v = sum(vocab.values()), len(vocab)
    denom = total + v + 1

    out = with_unigram_stats(
        docs_df, "text", top_vocab(docs_df, "text"), id_col="doc_id"
    )
    assert set(out.columns) == {
        "doc_id", "text", "n_words", "n_oov", "sum_count", "mean_log2p"
    }
    got = {r["doc_id"]: r for r in out.collect()}
    for doc_id, text in DOCS:
        words = text.split(" ")
        n_oov = sum(1 for w in words if w not in vocab)
        sum_count = sum(vocab.get(w, 0) for w in words)
        mean = sum(
            math.log2((vocab.get(w, 0) + 1) / denom) for w in words
        ) / len(words)
        r = got[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_oov"] == n_oov, (doc_id, r["n_oov"], n_oov)
        assert r["sum_count"] == sum_count
        assert abs(r["mean_log2p"] - mean) < 1e-9, doc_id
    # the all-rare doc scores at the OOV floor; common-word docs above it
    assert got[3]["mean_log2p"] == pytest.approx(math.log2(1 / denom))
    assert got[5]["mean_log2p"] > got[3]["mean_log2p"]
