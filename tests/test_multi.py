"""Fused one-pass multi-sketch profiling (sketches/multi.py).

Contracts under test:
- fused profile == independent per-sketch builds (byte-identical states
  for batch-order-insensitive sketches: HLL max, CMS sum, Bloom or;
  bound-equivalent for KLL);
- the whole profile reads its input exactly ONCE (plan-level);
- token n-gram feeds count ALL windows (CMS totals) and agree with the
  dedup shingle kernels on the window-hash values;
- merge topology (salted pre-merge vs driver fold) is invisible;
- partitioning-order independence (north-rule merge associativity).
"""

import numpy as np
import pytest

from recsplit_spark.pipeline.dedup import _token_shingle_hashes
from recsplit_spark.sketches import (
    KLL,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    SketchSpec,
    profile,
    profile_estimates,
    token_ngram_hashes,
)
from recsplit_spark.sketches.multi import _stage1


@pytest.fixture(scope="module")
def seq_df(spark):
    from recsplit_spark.data import sequences

    return sequences(spark, 5_000, partitions=6).cache()


def test_profile_matches_individual_builds(spark, seq_df):
    hll = HyperLogLog(p=12)
    cms = CountMinSketch(eps=0.01, delta=0.01)
    bloom = BloomFilter(n_expected=10_000, fpr=0.01)
    specs = [
        SketchSpec("docs", hll, "doc_id"),
        SketchSpec("sources", cms, "source"),
        SketchSpec("members", bloom, "doc_id"),
    ]
    fused = profile(seq_df, specs)
    assert fused["docs"].tobytes() == hll.build(seq_df, "doc_id").tobytes()
    assert fused["sources"].tobytes() == cms.build(seq_df, "source").tobytes()
    assert fused["members"].tobytes() == bloom.build(seq_df, "doc_id").tobytes()


def test_profile_kll_and_estimates(spark, seq_df):
    kll = KLL(k=200)
    hll = HyperLogLog(p=12)
    est = profile_estimates(
        seq_df,
        [SketchSpec("ntok", kll, "n_tok"), SketchSpec("docs", hll, "doc_id")],
    )
    assert abs(est["docs"] - 5_000) <= 3 * hll.relative_error * 5_000
    # KLL lives in the same pass; check the median's rank error bound
    states = profile(seq_df, [SketchSpec("ntok", kll, "n_tok")])
    med = kll.quantile(states["ntok"], 0.5)
    rank = seq_df.filter(f"n_tok <= {med}").count() / 5_000
    assert abs(rank - 0.5) <= kll.epsilon + 0.01


def test_profile_is_single_scan(spark, tmp_path, seq_df):
    import contextlib
    import io

    path = str(tmp_path / "seq")
    seq_df.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    specs = [
        SketchSpec("docs", HyperLogLog(p=12), "doc_id"),
        SketchSpec("sources", CountMinSketch(eps=0.01, delta=0.01), "source"),
        SketchSpec("ntok", KLL(k=200), "n_tok"),
        SketchSpec("grams", HyperLogLog(p=12), "tokens", ngram=5),
    ]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _stage1(df, specs).explain("formatted")
    plan = buf.getvalue()
    import re

    # tree section lists each node once as "(N) Scan parquet"
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)) == 1
    # column pruning reaches the scan: doc_id/source/n_tok/tokens, not text
    assert "doc_id" in plan and "tokens" in plan


def test_ngram_cms_counts_all_windows(spark):
    # 100 copies of the same 7-token doc: every 3-gram occurs exactly
    # 100x its per-doc multiplicity, and CMS(eps small) reads it exactly
    toks = [5, 9, 5, 9, 5, 9, 7]
    df = spark.createDataFrame(
        [(i, toks) for i in range(100)], "id long, tokens array<int>"
    ).repartition(4)
    cms = CountMinSketch(eps=0.001, delta=0.01)
    st = profile(df, [SketchSpec("g3", cms, "tokens", ngram=3)])["g3"]
    assert cms.total(st) == 100 * (7 - 3 + 1)
    h = token_ngram_hashes(np.array(toks, dtype=np.int64), 3)
    # (5,9,5) occurs twice per doc, (9,5,9) twice, (5,9,7) once
    est = cms.query_hashes(st, h)
    assert est.tolist() == [200, 200, 200, 200, 100]
    # window hashes interoperate with the dedup shingle kernel
    assert set(h.view(np.uint64).tolist()) == set(
        _token_shingle_hashes(np.array(toks), 3).tolist()
    )


def test_ngram_hll_distinct_bound(spark, seq_df):
    hll = HyperLogLog(p=12)
    st = profile(seq_df, [SketchSpec("g5", hll, "tokens", ngram=5)])["g5"]
    est = hll.estimate(st)

    # exact distinct 5-gram hash count, computed via the per-doc kernel
    rows = seq_df.select("tokens").collect()
    seen = set()
    for r in rows:
        seen.update(_token_shingle_hashes(np.array(r["tokens"]), 5).tolist())
    exact = len(seen)
    assert abs(est - exact) <= 3 * hll.relative_error * exact


def test_profile_partitioning_invariant(spark, seq_df):
    hll = HyperLogLog(p=12)
    cms = CountMinSketch(eps=0.01, delta=0.01)
    specs = [
        SketchSpec("docs", hll, "doc_id"),
        SketchSpec("grams", cms, "tokens", ngram=4),
    ]
    a = profile(seq_df.repartition(3), specs)
    b = profile(seq_df.repartition(17), specs)
    assert a["docs"].tobytes() == b["docs"].tobytes()
    assert a["grams"].tobytes() == b["grams"].tobytes()


def test_profile_premerge_topology_invisible(spark, seq_df, monkeypatch):
    # force the salted distributed pre-merge path and check byte-identity
    import recsplit_spark.sketches.multi as multi

    hll = HyperLogLog(p=12)
    spec = [SketchSpec("docs", hll, "doc_id")]
    plain = profile(seq_df, spec)["docs"].tobytes()
    monkeypatch.setattr(
        HyperLogLog, "approx_state_bytes", lambda self: 1 << 30
    )
    assert multi.profile(seq_df, spec)["docs"].tobytes() == plain


def test_profile_empty_and_validation(spark):
    df = spark.createDataFrame([], "doc_id string, tokens array<int>")
    hll = HyperLogLog(p=12)
    st = profile(df, [SketchSpec("docs", hll, "doc_id")])["docs"]
    assert hll.estimate(st) == 0.0
    with pytest.raises(ValueError, match="duplicate"):
        profile(df, [SketchSpec("a", hll, "doc_id"), SketchSpec("a", hll, "doc_id")])
    with pytest.raises(ValueError, match="cannot fold n-gram window hashes"):
        profile(df, [SketchSpec("g", KLL(), "tokens", ngram=3)])
