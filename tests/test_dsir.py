"""DSIR importance resampling: bucket-fold contract, histogram vs exact
explode, integer-score identity, resampling shifts toward the target."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recsplit_spark.pipeline.dsir import (
    _MIX,
    _MOD,
    _window_buckets,
    feature_logratio_micro,
    gumbel_topk,
    hashed_window_counts,
    importance_scores,
)


def _bucket_sql_expr(n: int, buckets: int) -> str:
    """The bucket fold as a Spark SQL expression over `tokens` — the same
    arithmetic the DuckDB oracle uses; tests pin kernel == SQL."""
    h = "0L"
    for j in range(n):
        h = f"pmod({h} * {_MIX}L + element_at(tokens, i + {j}), {_MOD}L)"
    return (
        f"transform(sequence(1, greatest(size(tokens) - {n - 1}, 0)),"
        f" i -> int(pmod({h}, {buckets})))"
    )


def _docs(spark, n_docs=400, seed=1, vocab=50, shift=0):
    rng = np.random.default_rng(seed)
    rows = [
        (
            f"d{shift + i}",
            (rng.integers(shift, shift + vocab, rng.integers(2, 40))).tolist(),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_window_buckets_match_reference_fold():
    rng = np.random.default_rng(0)
    lens = rng.integers(0, 9, 30)
    flat = rng.integers(0, 2**31 - 1, int(lens.sum()))
    for n in (1, 2, 3):
        got, n_w = _window_buckets(flat, lens.astype(np.int64), n, 97)
        np.testing.assert_array_equal(n_w, np.maximum(lens - n + 1, 0))
        want = []
        off = 0
        for L in lens:
            doc = flat[off : off + L]
            off += L
            for s in range(max(0, L - n + 1)):
                h = 0
                for j in range(n):
                    h = (h * _MIX + int(doc[s + j])) % _MOD
                want.append(h % 97)
        np.testing.assert_array_equal(got, np.array(want, dtype=np.int64))


def test_window_buckets_chunking_is_value_identical():
    import recsplit_spark.pipeline.dsir as d

    rng = np.random.default_rng(2)
    lens = rng.integers(0, 200, 3000).astype(np.int64)
    flat = rng.integers(0, 2**31 - 1, int(lens.sum()))
    big, _ = _window_buckets(flat, lens, 2, 1 << 14)
    old = d._CHUNK_W
    try:
        d._CHUNK_W = 1 << 8
        small, _ = _window_buckets(flat, lens, 2, 1 << 14)
    finally:
        d._CHUNK_W = old
    np.testing.assert_array_equal(big, small)


def test_histogram_matches_exact_explode(spark):
    docs = _docs(spark)
    for n in (1, 2):
        got = {
            r["bucket"]: r["cnt"]
            for r in hashed_window_counts(docs, "tokens", buckets=64, n=n).collect()
        }
        exact = {
            r["b"]: r["c"]
            for r in docs.select(
                F.explode(F.expr(_bucket_sql_expr(n, 64))).alias("b")
            )
            .groupBy("b")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        assert got == exact


def test_scores_match_exact_sql_recompute(spark):
    target = _docs(spark, seed=5, vocab=10)  # narrow vocab = the target
    raw = _docs(spark, seed=6, vocab=50)
    B, n = 64, 2
    lr = feature_logratio_micro(
        hashed_window_counts(target, "tokens", buckets=B, n=n),
        hashed_window_counts(raw, "tokens", buckets=B, n=n),
        buckets=B,
    )
    scored = importance_scores(raw, "tokens", lr, n=n)
    lr_map = F.array(*[F.lit(int(v)) for v in lr])
    exact = raw.withColumn(
        "want",
        F.aggregate(
            F.expr(_bucket_sql_expr(n, B)),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(lr_map, b + 1),
        ),
    )
    joined = scored.join(exact.select("doc_id", "want"), "doc_id")
    bad = joined.filter(F.col("dsir_score_micro") != F.col("want")).count()
    assert bad == 0
    # short docs (< n tokens) score exactly 0
    one_tok = spark.createDataFrame(
        [("t", [5])], "doc_id string, tokens array<int>"
    )
    assert (
        importance_scores(one_tok, "tokens", lr, n=2).collect()[0][
            "dsir_score_micro"
        ]
        == 0
    )


def test_resampling_shifts_toward_target(spark):
    # raw = half target-like (vocab 0-9), half off-target (vocab 1000+);
    # the Gumbel top-100 must be overwhelmingly target-like
    like = _docs(spark, n_docs=300, seed=7, vocab=10)
    unlike = _docs(spark, n_docs=300, seed=8, vocab=10, shift=1000)
    raw = like.unionByName(unlike)
    target = _docs(spark, n_docs=300, seed=9, vocab=10)
    B, n = 256, 1
    lr = feature_logratio_micro(
        hashed_window_counts(target, "tokens", buckets=B, n=n),
        hashed_window_counts(raw, "tokens", buckets=B, n=n),
        buckets=B,
    )
    scored = importance_scores(raw, "tokens", lr, n=n).cache()
    picked = gumbel_topk(scored, 100, seed=3).collect()
    assert len(picked) == 100
    n_like = sum(1 for r in picked if int(r["doc_id"][1:]) < 1000)
    assert n_like >= 90
    # deterministic: same seed -> same sample, on a different partitioning
    again = gumbel_topk(scored.repartition(7), 100, seed=3).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in picked}
    scored.unpersist()


def test_empty_and_bounds(spark):
    docs = _docs(spark, n_docs=5)
    with pytest.raises(ValueError, match="buckets"):
        hashed_window_counts(docs, "tokens", buckets=1)
    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    assert hashed_window_counts(empty, "tokens", buckets=16).count() == 0
    with pytest.raises(ValueError, match="empty"):
        feature_logratio_micro(
            hashed_window_counts(empty, "tokens", buckets=16),
            hashed_window_counts(docs, "tokens", buckets=16),
            buckets=16,
        )
