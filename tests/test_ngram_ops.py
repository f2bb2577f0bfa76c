"""Per-key n-gram sketch feeds + heavy n-gram hitters (round 4).

Contracts under test:
- ``partials(..., ngram=n)`` feeds reject value sketches (quantiles of
  hashes are meaningless) and accept hash sketches + MisraGries;
- MG over gram hashes counts exactly when k exceeds the distinct-gram
  count, and its certified bound holds under trimming (small k);
- ``heavy_ngrams`` resolves top hashes back to the actual token grams,
  with counts matching an exact per-window enumeration;
- per-key theta n-gram states give EXACT pairwise gram-set Jaccard when
  distinct grams per group < theta k (KMV exactness regime);
- partition-count invariance (north-rule merge order-independence).
"""

import numpy as np
import pandas as pd
import pytest

from recsplit_spark.sketches import KLL, MisraGries, ThetaSketch, heavy_ngrams
from recsplit_spark.sketches.multi import _flat_ngram_hashes_pos, token_ngram_hashes


def _exact_gram_counts(docs: list[list[int]], n: int) -> dict[tuple, int]:
    out: dict[tuple, int] = {}
    for d in docs:
        for i in range(len(d) - n + 1):
            g = tuple(d[i : i + n])
            out[g] = out.get(g, 0) + 1
    return out


@pytest.fixture(scope="module")
def gram_corpus(spark):
    """120 docs over a tiny token alphabet (many repeated grams), with a
    planted boilerplate 4-gram [7, 8, 9, 7] injected into 40 docs."""
    rng = np.random.default_rng(7)
    docs = []
    for i in range(120):
        toks = rng.integers(0, 12, size=rng.integers(8, 40)).tolist()
        if i % 3 == 0:
            at = rng.integers(0, max(1, len(toks) - 4))
            toks[at : at + 4] = [7, 8, 9, 7]
        docs.append([int(t) for t in toks])
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(len(docs))],
            "grp": [f"g{i % 3}" for i in range(len(docs))],
            "tokens": docs,
        }
    )
    df = spark.createDataFrame(
        pdf, "doc_id string, grp string, tokens array<int>"
    ).repartition(5).cache()
    return df, docs


def test_ngram_feed_rejects_value_sketches(spark, gram_corpus):
    df, _ = gram_corpus
    with pytest.raises(ValueError, match="cannot fold"):
        KLL(k=128).partials(df, "tokens", ngram=4)
    with pytest.raises(ValueError, match=">= 1"):
        ThetaSketch(k=64).partials(df, "tokens", ngram=0)


def test_mg_ngram_exact_when_k_large(spark, gram_corpus):
    df, docs = gram_corpus
    exact = _exact_gram_counts(docs, 4)
    mg = MisraGries(k=len(exact) + 10)
    state = mg.build(df, "tokens", ngram=4)
    assert mg.error_bound(state) == 0
    assert state.n == sum(exact.values())
    for g, c in exact.items():
        h = int(token_ngram_hashes(list(g), 4)[0])
        assert mg.estimate_count(state, str(h)) == c


def test_mg_ngram_bound_holds_under_trim(spark, gram_corpus):
    df, docs = gram_corpus
    exact = _exact_gram_counts(docs, 4)
    mg = MisraGries(k=16)
    state = mg.build(df, "tokens", ngram=4)
    dec = mg.error_bound(state)
    assert 0 < dec <= state.n // (16 + 1)
    for g, c in exact.items():
        est = mg.estimate_count(state, str(int(token_ngram_hashes(list(g), 4)[0])))
        assert est <= c <= est + dec
        if c > dec:  # published retention guarantee
            assert est > 0


def test_heavy_ngrams_matches_exact_enumeration(spark, gram_corpus):
    df, docs = gram_corpus
    exact = _exact_gram_counts(docs, 4)
    out = heavy_ngrams(df, "tokens", 4, k=len(exact) + 10, top=20).collect()
    assert len(out) == 20
    assert all(r["max_undercount"] == 0 for r in out)
    top_exact = sorted(exact.items(), key=lambda kv: -kv[1])[:20]
    got = {tuple(r["gram"]): r["count_est"] for r in out}
    # exact regime: the top-20 multiset of (gram, count) matches exactly
    # up to count ties at the tail boundary — compare count multisets and
    # that every reported gram has its exact count
    assert sorted(got.values(), reverse=True) == [c for _, c in top_exact]
    for g, c in got.items():
        assert exact[g] == c
    # the planted boilerplate gram is the single heaviest
    assert tuple(out[0]["gram"]) == (7, 8, 9, 7)
    # ordering: heaviest first, deterministic tiebreak
    ests = [r["count_est"] for r in out]
    assert ests == sorted(ests, reverse=True)


def test_heavy_ngrams_partition_invariance(spark, gram_corpus):
    df, docs = gram_corpus
    k = len(_exact_gram_counts(docs, 4)) + 10
    a = heavy_ngrams(df.repartition(2), "tokens", 4, k=k, top=10).collect()
    b = heavy_ngrams(df.repartition(9), "tokens", 4, k=k, top=10).collect()
    # retained sets can differ under trimming across merge orders (only
    # the bound is order-independent), but k > distinct grams keeps both
    # exact -> identical rows
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # under trimming, both partitionings still certify the same planted
    # top gram within their own bounds
    for rows in (
        heavy_ngrams(df.repartition(2), "tokens", 4, k=512, top=3).collect(),
        heavy_ngrams(df.repartition(9), "tokens", 4, k=512, top=3).collect(),
    ):
        assert tuple(rows[0]["gram"]) == (7, 8, 9, 7)
        assert rows[0]["count_est"] <= 40 <= (
            rows[0]["count_est"] + rows[0]["max_undercount"]
        )


def test_theta_ngram_pairwise_exact_jaccard(spark, gram_corpus):
    df, docs = gram_corpus
    # exact distinct gram-hash sets per group (same window hash contract)
    sets: dict[str, set] = {}
    for i, d in enumerate(docs):
        g = f"g{i % 3}"
        arr = np.asarray(d, dtype=np.int64)
        h, _ = _flat_ngram_hashes_pos(
            arr.astype(np.uint64), np.array([len(arr)]), 4
        )
        sets.setdefault(g, set()).update(h.tolist())
    th = ThetaSketch(k=4096)  # > distinct grams -> exact
    rows = th.pairwise_set_estimates(df, "tokens", "grp", ngram=4).collect()
    assert len(rows) == 3
    for r in rows:
        a, b = sets[r["key_a"]], sets[r["key_b"]]
        assert r["inter_est"] == pytest.approx(len(a & b))
        assert r["union_est"] == pytest.approx(len(a | b))
        assert r["jaccard_est"] == pytest.approx(len(a & b) / len(a | b))


def test_theta_ngram_aggregate_counts_distinct_grams(spark, gram_corpus):
    df, docs = gram_corpus
    th = ThetaSketch(k=4096)
    got = {
        r["grp"]: r["estimate"]
        for r in th.aggregate(df, "tokens", ("grp",), ngram=4).collect()
    }
    for g in ("g0", "g1", "g2"):
        arrs = [docs[i] for i in range(len(docs)) if i % 3 == int(g[1])]
        exact = len(_exact_gram_counts(arrs, 4))
        assert got[g] == pytest.approx(exact)


def test_heavy_ngrams_by_key_matches_per_group_enumeration(spark, gram_corpus):
    """Per-group heavy grams from ONE states_by_key scan + ONE resolve
    scan: in the exact regime (k > distinct grams) every group's (gram,
    count) rows equal its own exact enumeration, and the planted
    boilerplate gram — injected only into docs of group g0 — tops g0 and
    appears in no other group."""
    from recsplit_spark.sketches import heavy_ngrams_by_key

    df, docs = gram_corpus
    per_group = {}
    for i, d in enumerate(docs):
        per_group.setdefault(f"g{i % 3}", []).append(d)
    k = max(len(_exact_gram_counts(v, 4)) for v in per_group.values()) + 10
    rows = heavy_ngrams_by_key(df, "tokens", 4, ["grp"], k=k, top=5).collect()
    assert all(r["max_undercount"] == 0 for r in rows)
    got = {}
    for r in rows:
        got.setdefault(r["grp"], []).append(
            (tuple(r["gram"]), int(r["count_est"]))
        )
    assert set(got) == {"g0", "g1", "g2"}
    for grp, pairs in got.items():
        exact = _exact_gram_counts(per_group[grp], 4)
        top_exact = sorted(exact.items(), key=lambda kv: -kv[1])[:5]
        assert sorted((c for _, c in pairs), reverse=True) == [
            c for _, c in top_exact
        ]
        for g, c in pairs:
            assert exact[g] == c
    assert got["g0"][0][0] == (7, 8, 9, 7)  # planted gram tops its group
    assert all(g != (7, 8, 9, 7) for g, _ in got["g1"] + got["g2"])
