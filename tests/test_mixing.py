import math

import pytest

from recsplit_spark.pipeline.mixing import mix_corpus, weights_for_budgets


def _docs(spark, n=60, groups=("a", "b", "c"), partitions=4):
    rows = [
        (i, groups[i % len(groups)], f"text {i}", 10 + i % 7)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    ).repartition(partitions)


WEIGHTS = {"a": 0.0, "b": 0.4, "c": 2.25}


def _collect(df):
    return sorted((r["doc_id"], r["source"], r["epoch"]) for r in df.collect())


def test_exact_mode_counts_and_epochs(spark):
    docs = _docs(spark)  # 20 docs per group
    out = mix_corpus(docs, WEIGHTS, exact=True)
    rows = _collect(out)
    by_group = {}
    for doc_id, source, epoch in rows:
        by_group.setdefault(source, {}).setdefault(doc_id, []).append(epoch)
    # group a dropped entirely
    assert "a" not in by_group
    # b: exactly floor(0.4*20 + 0.5) = 8 docs, one copy each
    assert len(by_group["b"]) == 8
    assert all(eps == [0] for eps in by_group["b"].values())
    # c: every doc twice, floor(0.25*20 + 0.5) = 5 docs a third time
    assert len(by_group["c"]) == 20
    copies = sorted(len(eps) for eps in by_group["c"].values())
    assert copies == [2] * 15 + [3] * 5
    # epochs are consecutive 0..copies-1 per doc
    for eps in by_group["c"].values():
        assert sorted(eps) == list(range(len(eps)))


def test_mixing_deterministic_across_partitioning(spark):
    docs = _docs(spark, n=90, partitions=3)
    for exact in (False, True):
        a = _collect(mix_corpus(docs, WEIGHTS, exact=exact, seed=7))
        b = _collect(
            mix_corpus(docs.repartition(13), WEIGHTS, exact=exact, seed=7)
        )
        assert a == b and a


def test_bernoulli_rates_nest_and_integer_part_is_exact(spark):
    docs = _docs(spark, n=300, groups=("g",))
    kept = {}
    for rate in (0.3, 0.7, 1.3):
        out = mix_corpus(docs, {"g": rate}, seed=5)
        rows = _collect(out)
        # integer part: every doc has at least floor(rate) copies
        per_doc = {}
        for doc_id, _, _ in rows:
            per_doc[doc_id] = per_doc.get(doc_id, 0) + 1
        base = int(math.floor(rate))
        if base:
            assert len(per_doc) == 300
        assert all(c in (base, base + 1) for c in per_doc.values())
        kept[rate] = {d for d, c in per_doc.items() if c == base + 1}
    # same u, rising threshold: the FRACTIONAL-part sets nest.
    # frac(1.3) = 0.3 + eps, so its extra-copy set sits between the
    # 0.3 and 0.7 sets (not above 0.7 — the integer part is separate).
    assert kept[0.3] <= kept[1.3] <= kept[0.7]
    assert len(kept[0.3]) < len(kept[0.7]) < 300
    # different seed = a different (still deterministic) fractional set
    other = mix_corpus(docs, {"g": 0.7}, seed=6)
    assert {r["doc_id"] for r in other.collect()} != kept[0.7]


def test_weights_dataframe_matches_dict(spark):
    docs = _docs(spark)
    wdf = spark.createDataFrame(
        list(WEIGHTS.items()), "source string, weight double"
    )
    for exact in (False, True):
        assert _collect(mix_corpus(docs, wdf, exact=exact)) == _collect(
            mix_corpus(docs, WEIGHTS, exact=exact)
        )


def test_default_weight_and_validation(spark):
    docs = _docs(spark)
    # unlisted groups dropped by default...
    out = mix_corpus(docs, {"b": 1.0}, exact=True)
    assert {r["source"] for r in out.collect()} == {"b"}
    # ...or kept at default_weight
    out = mix_corpus(docs, {"b": 2.0}, default_weight=1.0, exact=True)
    per = {
        g: n
        for g, n in out.groupBy("source").count().collect()
    }
    assert per == {"a": 20, "b": 40, "c": 20}
    with pytest.raises(ValueError, match=">= 0"):
        mix_corpus(docs, {"b": -0.5})
    with pytest.raises(ValueError, match="default_weight"):
        mix_corpus(docs, {"b": 1.0}, default_weight=-1.0)


def test_weights_for_budgets(spark):
    docs = _docs(spark)  # per-group n_chars totals are exact integers
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg({"n_chars": "sum"})
        .withColumnRenamed("sum(n_chars)", "t")
        .collect()
    }
    budgets = {"a": totals["a"] / 2, "b": 2 * totals["b"], "zzz": 10.0}
    w = weights_for_budgets(docs, budgets)
    assert w == {"a": 0.5, "b": 2.0}  # absent group omitted
    with pytest.raises(ValueError, match=">= 0"):
        weights_for_budgets(docs, {"a": -1.0})
