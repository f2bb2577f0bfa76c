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


def test_profile_by_key_matches_states_by_key(spark, seq_df):
    """Grouped fused profile == per-sketch states_by_key, byte-identical
    per (key, spec) for batch-order-insensitive states (HLL max, CMS
    sum) — one scan replacing S."""
    from recsplit_spark.sketches import profile_by_key

    hll = HyperLogLog(p=12)
    cms = CountMinSketch(eps=0.01, delta=0.01)
    fused = {
        (r["source"], r["name"]): bytes(r["state"])
        for r in profile_by_key(
            seq_df,
            ["source"],
            [
                SketchSpec("docs", hll, "doc_id"),
                SketchSpec("freq", cms, "doc_id"),
            ],
        ).collect()
    }
    for name, sk in (("docs", hll), ("freq", cms)):
        solo = {
            r["source"]: bytes(r["state"])
            for r in sk.states_by_key(seq_df, "doc_id", ["source"]).collect()
        }
        assert set(solo) == {k for k, n in fused if n == name}
        for src, blob in solo.items():
            assert fused[(src, name)] == blob, (name, src)


def test_profile_estimates_by_key_vs_exact(spark, seq_df):
    """Per-group one-pass estimates: HLL distinct docs per source within
    bound of the exact groupBy answer, and per-source distinct-trigram
    HLL within bound of the exact distributed kernel count."""
    import pyspark.sql.functions as F

    from recsplit_spark.sketches import profile_estimates_by_key

    hll_docs = HyperLogLog(p=12)
    hll_g = HyperLogLog(p=12)
    est = {
        r["source"]: r
        for r in profile_estimates_by_key(
            seq_df,
            ["source"],
            [
                SketchSpec("docs", hll_docs, "doc_id"),
                SketchSpec("grams", hll_g, "tokens", ngram=3),
            ],
        ).collect()
    }
    exact_docs = {
        r["source"]: r["d"]
        for r in seq_df.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact_docs)
    for src, d in exact_docs.items():
        assert abs(est[src]["docs"] - d) <= 3 * hll_docs.relative_error * d

    # exact per-source distinct trigram hashes via the per-doc kernel
    rows = seq_df.select("source", "tokens").collect()
    seen: dict = {}
    for r in rows:
        seen.setdefault(r["source"], set()).update(
            _token_shingle_hashes(np.array(r["tokens"]), 3).tolist()
        )
    for src, grams in seen.items():
        assert (
            abs(est[src]["grams"] - len(grams))
            <= 3 * hll_g.relative_error * len(grams)
        ), src


def test_profile_by_key_is_single_scan(spark, tmp_path, seq_df):
    import contextlib
    import io
    import re

    from recsplit_spark.sketches.multi import _stage1_by_key

    path = str(tmp_path / "seqk")
    seq_df.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    specs = [
        SketchSpec("docs", HyperLogLog(p=12), "doc_id"),
        SketchSpec("grams", HyperLogLog(p=12), "tokens", ngram=5),
    ]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _stage1_by_key(df, ["source"], specs).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)) == 1


def test_profile_by_key_validation(spark, seq_df):
    from recsplit_spark.sketches import (
        profile_by_key,
        profile_estimates_by_key,
    )

    hll = HyperLogLog(p=12)
    with pytest.raises(ValueError, match="at least one key"):
        profile_by_key(seq_df, [], [SketchSpec("docs", hll, "doc_id")])
    with pytest.raises(ValueError, match="shadow key columns"):
        profile_by_key(seq_df, ["source"], [SketchSpec("source", hll, "doc_id")])
    with pytest.raises(ValueError, match="no scalar estimate"):
        profile_estimates_by_key(
            seq_df,
            ["source"],
            [SketchSpec("m", BloomFilter(n_expected=100, fpr=0.01), "doc_id")],
        )


def test_merge_state_tables_keeps_profile_names_separate(spark, seq_df):
    """merge_state_tables documents accepting profile_by_key tables; the
    extra ``name`` column must ride as an implicit group key — two
    same-config HLL specs over DIFFERENT columns must NOT fold into one
    state per source (that would silently union their registers)."""
    from recsplit_spark.sketches import profile_by_key

    hll = HyperLogLog(p=12)
    tbl = profile_by_key(
        seq_df,
        ["source"],
        [
            SketchSpec("docs", hll, "doc_id"),
            SketchSpec("lens", hll, "n_tok"),
        ],
    )
    merged = hll.merge_state_tables([tbl], ["source"]).collect()
    assert {r["name"] for r in merged} == {"docs", "lens"}
    by_key = {(r["source"], r["name"]): bytes(r["state"]) for r in merged}
    assert len(by_key) == len(merged)  # one row per (source, spec)
    solo = {
        r["source"]: bytes(r["state"])
        for r in hll.states_by_key(seq_df, "doc_id", ["source"]).collect()
    }
    for src, blob in solo.items():
        assert by_key[(src, "docs")] == blob, src  # unchanged, not unioned


def test_profile_by_key_flush_crossover_matches_direct(spark):
    """A group crossing its buffer cap (state_bytes/8 elems) mid-scan
    (buffer -> materialized state -> further direct updates) must produce
    the same bytes as a one-shot reference update; a value spec (KLL, not
    elementwise) rides the same scan through the eager path."""
    import numpy as np
    import pyspark.sql.functions as F

    from recsplit_spark.sketches import KLL, profile_by_key

    n_heavy, n_small = 80_000, 40
    df = spark.range(n_heavy + 5 * n_small, numPartitions=1).select(
        F.when(F.col("id") < n_heavy, F.lit("heavy"))
        .otherwise(
            F.concat(
                F.lit("s"),
                ((F.col("id") - n_heavy) / n_small).cast("int").cast("string"),
            )
        )
        .alias("grp"),
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )
    hll = HyperLogLog(p=14)
    rows = profile_by_key(
        df, ["grp"], [SketchSpec("ids", hll, "v"), SketchSpec("xs", KLL(k=128), "x")]
    ).collect()
    got = {(r["grp"], r["name"]): bytes(r["state"]) for r in rows}
    hashed = df.select(
        "grp", F.xxhash64(F.col("v").cast("string")).alias("h")
    ).collect()
    by_grp: dict[str, list[int]] = {}
    for r in hashed:
        by_grp.setdefault(r["grp"], []).append(r["h"])
    for g, hs in by_grp.items():
        ref = hll.new_state()
        hll.update(ref, np.array(hs, dtype=np.int64))
        assert got[(g, "ids")] == hll.to_bytes(ref), g
        assert (g, "xs") in got  # KLL state present for every group
