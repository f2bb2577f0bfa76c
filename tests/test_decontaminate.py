"""Benchmark decontamination vs a brute-force token-tuple reference."""

import numpy as np
import pandas as pd
import pytest

from recsplit_spark.pipeline.decontaminate import (
    benchmark_windows,
    contamination,
    decontaminate,
)


def _ref_sets(docs, bench, n):
    """Reference contaminated-window counts + hit offsets by exact
    token-tuple matching."""
    bset = set()
    for _, toks in bench:
        for i in range(len(toks) - n + 1):
            bset.add(tuple(toks[i : i + n]))
    counts, spans = {}, {}
    for did, toks in docs:
        hits = [
            i
            for i in range(len(toks) - n + 1)
            if tuple(toks[i : i + n]) in bset
        ]
        counts[did] = len(hits)
        spans[did] = hits
    return counts, spans


def _ref_cut(toks, starts, n):
    covered = [False] * len(toks)
    for s in starts:
        for j in range(s, min(s + n, len(toks))):
            covered[j] = True
    return [t for t, c in zip(toks, covered) if not c]


def _fixture(seed=7, n_docs=120, n_bench=10, vocab=23):
    """Small-vocab corpus (accidental n-gram repeats happen) + a
    benchmark whose questions are partly verbatim corpus slices, so
    genuine contamination is guaranteed alongside the accidental
    hits."""
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        ln = int(rng.integers(0, 30))
        docs.append((f"d{i:04d}", rng.integers(0, vocab, ln).tolist()))
    bench = []
    for j in range(n_bench):
        ln = int(rng.integers(4, 18))
        q = rng.integers(0, vocab, ln).tolist()
        if j % 2 == 0:  # half the questions quote a corpus slice
            src = docs[int(rng.integers(0, n_docs))][1]
            if len(src) >= 6:
                a = int(rng.integers(0, len(src) - 5))
                q = q[:3] + src[a : a + 6] + q[3:]
        bench.append((f"q{j}", q))
    return docs, bench


def _frames(spark, docs, bench):
    schema = "doc_id string, tokens array<int>"
    corpus = spark.createDataFrame(
        [(d, t) for d, t in docs], schema
    ).repartition(5)
    bdf = spark.createDataFrame([(d, t) for d, t in bench], schema)
    return corpus, bdf


@pytest.mark.parametrize("waves", [1, 3])
def test_flag_matches_bruteforce(spark, waves):
    n = 4
    docs, bench = _fixture()
    counts, _ = _ref_sets(docs, bench, n)
    corpus, bdf = _frames(spark, docs, bench)
    out = contamination(corpus, bdf, n=n, waves=waves).collect()
    assert len(out) == len(docs)
    for r in out:
        assert r["contam_windows"] == counts[r["doc_id"]], r["doc_id"]
        assert r["contaminated"] == (counts[r["doc_id"]] > 0)


def test_drop_matches_bruteforce(spark):
    n = 4
    docs, bench = _fixture(seed=11)
    counts, _ = _ref_sets(docs, bench, n)
    corpus, bdf = _frames(spark, docs, bench)
    kept = decontaminate(corpus, bdf, n=n, mode="drop")
    assert kept.columns == corpus.columns
    got = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    want = sorted(d for d, _ in docs if counts[d] == 0)
    assert got == want


def test_cut_matches_bruteforce(spark):
    n = 4
    docs, bench = _fixture(seed=13)
    _, spans = _ref_sets(docs, bench, n)
    corpus, bdf = _frames(spark, docs, bench)
    out = decontaminate(corpus, bdf, n=n, mode="cut").collect()
    assert len(out) == len(docs)
    by_id = {d: t for d, t in docs}
    for r in out:
        want = _ref_cut(by_id[r["doc_id"]], spans[r["doc_id"]], n)
        assert list(r["tokens"]) == want, r["doc_id"]
        assert r["removed_tok"] == len(by_id[r["doc_id"]]) - len(want)


def test_precomputed_benchmark_windows_reused(spark):
    n = 4
    docs, bench = _fixture(seed=17)
    corpus, bdf = _frames(spark, docs, bench)
    bw = benchmark_windows(bdf, n=n)
    assert isinstance(bw, pd.DataFrame) and set(bw.columns) == {"h1", "h2"}
    a = contamination(corpus, bdf, n=n).collect()
    b = contamination(corpus, bw, n=n).collect()
    assert sorted((r["doc_id"], r["contam_windows"]) for r in a) == sorted(
        (r["doc_id"], r["contam_windows"]) for r in b
    )


def test_empty_benchmark_and_short_docs(spark):
    n = 5
    docs = [("a", [1, 2, 3]), ("b", list(range(20)))]
    corpus = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    empty_bench = spark.createDataFrame(
        [("q", [7, 8])], "doc_id string, tokens array<int>"
    )  # question shorter than n -> zero benchmark windows
    out = contamination(corpus, empty_bench, n=n).collect()
    assert all(r["contam_windows"] == 0 for r in out)
    kept = decontaminate(corpus, empty_bench, n=n, mode="drop")
    assert kept.count() == 2
    cut = decontaminate(corpus, empty_bench, n=n, mode="cut").collect()
    assert all(r["removed_tok"] == 0 for r in cut)


def test_contracts(spark):
    docs = [("a", list(range(10)))]
    corpus = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    bdf = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    with pytest.raises(ValueError, match="mode"):
        decontaminate(corpus, bdf, mode="purge")
    with pytest.raises(ValueError, match="waves"):
        contamination(corpus, bdf, waves=0)
    flagged = contamination(corpus, bdf, n=4)
    with pytest.raises(ValueError, match="contam"):
        contamination(flagged, bdf, n=4)


def test_reserved_and_order_preserving_columns(spark):
    """A corpus column named 'c' must survive (the internal count column
    is mangled), and flag/drop preserve df's column ORDER (id_col not
    first) for positional consumers."""
    docs = [(1.0, "a", list(range(10))), (2.0, "b", list(range(12)))]
    corpus = spark.createDataFrame(
        docs, "c double, doc_id string, tokens array<int>"
    )
    bdf = spark.createDataFrame(
        [("q", list(range(4, 9)))], "doc_id string, tokens array<int>"
    )
    flagged = contamination(corpus, bdf, n=5)
    assert flagged.columns == ["c", "doc_id", "tokens", "contam_windows",
                               "contaminated"]
    rows = {r["doc_id"]: r for r in flagged.collect()}
    assert rows["a"]["c"] == 1.0 and rows["a"]["contaminated"]
    kept = decontaminate(corpus, bdf, n=5, mode="drop")
    assert kept.columns == ["c", "doc_id", "tokens"]
