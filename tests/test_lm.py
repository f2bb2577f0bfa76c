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


def _pair_counter():
    c = Counter()
    for _, t in DOCS:
        ws = t.split(" ")
        c.update(zip(ws, ws[1:]))
    return c


def test_bigram_counts_exact(spark, docs_df):
    from recsplit_spark.pipeline.lm import bigram_counts

    got = {
        (r["w1"], r["w2"]): r["count"]
        for r in bigram_counts(docs_df, "text").collect()
    }
    assert got == dict(_pair_counter())


def test_top_bigrams_cap_and_tiebreak(spark, docs_df):
    from recsplit_spark.pipeline.lm import top_bigrams

    c = _pair_counter()
    want = sorted(
        ((p, n) for p, n in c.items() if n >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )
    got2 = [
        ((r["w1"], r["w2"]), r["count"])
        for r in top_bigrams(docs_df, "text", table_size=2).collect()
    ]
    assert got2 == want[:2]


def test_bigram_stats_match_reference(spark, docs_df):
    from recsplit_spark.pipeline.lm import (
        top_bigrams,
        top_vocab,
        with_bigram_stats,
    )

    lam = 0.7
    uc = _counter()
    vocab = {w: n for w, n in uc.items() if n >= 2}
    total, v = sum(vocab.values()), len(vocab)
    denom = total + v + 1
    bg = {p: n for p, n in _pair_counter().items() if n >= 2}

    out = with_bigram_stats(
        docs_df,
        "text",
        top_vocab(docs_df, "text"),
        top_bigrams(docs_df, "text"),
        lam=lam,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    for doc_id, text in DOCS:
        ws = text.split(" ")
        pairs = list(zip(ws, ws[1:]))
        r = got[doc_id]
        if not pairs:
            assert r["n_bigrams"] is None and r["mean_log2p_bigram"] is None
            continue
        hits = [p for p in pairs if p in bg and p[0] in vocab]
        mean = sum(
            math.log2(
                (lam * bg[p] / vocab[p[0]] if p in bg and p[0] in vocab else 0.0)
                + (1 - lam) * (vocab.get(p[1], 0) + 1) / denom
            )
            for p in pairs
        ) / len(pairs)
        assert r["n_bigrams"] == len(pairs)
        assert r["n_bigram_hits"] == len(hits)
        assert abs(r["mean_log2p_bigram"] - mean) < 1e-9, doc_id
    # unseen-text floor: every score >= log2((1-lam)/denom)
    floor = math.log2((1 - lam) / denom)
    for r in got.values():
        if r["mean_log2p_bigram"] is not None:
            assert r["mean_log2p_bigram"] >= floor - 1e-9
    # "the the the" is pure repeated top-bigram -> scores near the top
    assert got[5]["mean_log2p_bigram"] == max(
        r["mean_log2p_bigram"]
        for r in got.values()
        if r["mean_log2p_bigram"] is not None
    )


def test_bigram_stats_plan_is_broadcast_only(spark, docs_df):
    from recsplit_spark.pipeline.lm import (
        top_bigrams,
        top_vocab,
        with_bigram_stats,
    )

    out = with_bigram_stats(
        docs_df, "text", top_vocab(docs_df, "text"),
        top_bigrams(docs_df, "text"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the three dimension lookups (pair table, vocab x2) broadcast; the
    # only shuffle join is the O(docs) per-doc reattach on doc_id (the
    # same final shape as with_unigram_stats)
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1
