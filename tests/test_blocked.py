"""Blocked (huge-scale) MPHF: the reference's HEM design re-expressed
(``hem/HemGenerator.java:23-70``). Oracle = the canonical bijection
invariant (``RandomizedTest.java:1324-1347``) through the parquet-backed
descriptor, plus resume and token-equality checks."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from recsplit_spark.blocked import BlockedMPHF, BlockedMPHFBuilder
from recsplit_spark.data import sequences
from recsplit_spark.mphf import build_descriptor_from_sigs
from recsplit_spark.session import ship_package


@pytest.fixture(scope="module")
def seq20k(spark):
    ship_package(spark)
    return sequences(spark, 20_000, partitions=8).cache()


def _assert_bijection(df, n, col="mphf_index"):
    row = df.agg(
        F.count("*").alias("c"),
        F.countDistinct(col).alias("d"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
    ).collect()[0]
    assert (row["c"], row["d"], row["lo"], row["hi"]) == (n, n, 0, n - 1)


def test_local_descriptor_from_sigs_bijection():
    rng = np.random.default_rng(7)
    sigs = np.unique(rng.integers(-(2**63), 2**63, size=50_000, dtype=np.int64))
    desc = build_descriptor_from_sigs(sigs, 8, 128)
    idx = desc.evaluate_array(sigs)
    assert len(np.unique(idx)) == len(sigs)
    assert idx.min() == 0 and idx.max() == len(sigs) - 1
    assert desc.bits_per_key < 2.1


def test_blocked_build_evaluate_bijection(spark, seq20k, tmp_path):
    path = str(tmp_path / "bm")
    bm = BlockedMPHFBuilder(block_log2=4, partitions=4).build(seq20k, "doc_id", path)
    out = bm.evaluate(seq20k, "doc_id")
    _assert_bijection(out, 20_000)
    # at 1250 keys/block the per-block header dominates; it amortizes at the
    # production ~1M keys/block (the ≤2.0 space gate is covered by
    # test_local_descriptor_from_sigs_bijection on a single 50K-key block)
    assert bm.bits_per_key < 2.6


def test_blocked_token_equality_roundtrip(spark, seq20k, tmp_path):
    """input_hint per-row invariant: the MPHF index must function as a
    lossless row address — gather by index returns each row's exact tokens."""
    path = str(tmp_path / "bm_tok")
    bm = BlockedMPHFBuilder(block_log2=3, partitions=4).build(seq20k, "doc_id", path)
    idx = bm.evaluate(seq20k, "doc_id").select("doc_id", "tokens", "mphf_index")
    store = idx.select(
        F.col("mphf_index").alias("slot"), F.col("tokens").alias("stored")
    )
    back = idx.join(store, idx["mphf_index"] == store["slot"])
    n_equal = back.filter(F.col("tokens") == F.col("stored")).count()
    assert n_equal == 20_000


def test_blocked_load_meta(spark, seq20k, tmp_path):
    path = str(tmp_path / "bm_meta")
    bm = BlockedMPHFBuilder(block_log2=3, partitions=4).build(seq20k, "doc_id", path)
    bm2 = BlockedMPHF.load(spark, path)
    assert bm2.n == bm.n and bm2.salt == bm.salt
    assert np.array_equal(bm2.block_offsets, bm.block_offsets)
    _assert_bijection(bm2.evaluate(seq20k, "doc_id"), 20_000)


def test_blocked_resume_appends_only_missing(spark, seq20k, tmp_path):
    """Simulate a partial run: checkpoint holds only some blocks; the re-run
    must rebuild exactly the missing ones and agree with a fresh build."""
    path = str(tmp_path / "bm_resume")
    full = BlockedMPHFBuilder(block_log2=4, partitions=4).build(
        seq20k, "doc_id", str(tmp_path / "bm_full")
    )
    # fabricate the partial checkpoint: copy blocks for even ids only
    src = spark.read.parquet(full.blocks_path)
    src.filter(F.col("block") % 2 == 0).write.parquet(f"{path}/blocks/salt=0")
    resumed = BlockedMPHFBuilder(block_log2=4, partitions=4).build(
        seq20k, "doc_id", path
    )
    assert resumed.n == 20_000
    # identical per-block descriptors (deterministic kernel) => same bytes
    a = {
        r["block"]: bytes(r["blob"])
        for r in spark.read.parquet(full.blocks_path).collect()
    }
    b = {
        r["block"]: bytes(r["blob"])
        for r in spark.read.parquet(resumed.blocks_path).collect()
    }
    assert a == b
    _assert_bijection(resumed.evaluate(seq20k, "doc_id"), 20_000)


def test_blocked_lineage_metrics(spark, seq20k, tmp_path):
    path = str(tmp_path / "bm_lin")
    bm = BlockedMPHFBuilder(block_log2=3, partitions=4).build(seq20k, "doc_id", path)
    rows = spark.read.parquet(bm.blocks_path).collect()
    assert {r["block"] for r in rows} == set(range(8))
    assert all(r["build_ns"] > 0 and r["part_id"] >= 0 for r in rows)
    assert sum(r["n_keys"] for r in rows) == 20_000


def test_blocked_duplicate_keys_fail(spark, tmp_path):
    dup = spark.createDataFrame([("k1",), ("k1",), ("k2",)], "doc_id string")
    with pytest.raises(RuntimeError, match="salt re-rolls"):
        BlockedMPHFBuilder(block_log2=0, max_salt_retries=2).build(
            dup, "doc_id", str(tmp_path / "bm_dup")
        )


def test_blocked_waves_equivalent(spark, seq20k, tmp_path):
    """Waved build produces the identical block set as a single-job build."""
    single = BlockedMPHFBuilder(block_log2=4, partitions=4).build(
        seq20k, "doc_id", str(tmp_path / "bw_single")
    )
    waved = BlockedMPHFBuilder(
        block_log2=4, partitions=4, checkpoint_waves=4
    ).build(seq20k, "doc_id", str(tmp_path / "bw_waved"))
    a = {
        r["block"]: bytes(r["blob"])
        for r in spark.read.parquet(single.blocks_path).collect()
    }
    b = {
        r["block"]: bytes(r["blob"])
        for r in spark.read.parquet(waved.blocks_path).collect()
    }
    assert a == b
    _assert_bijection(waved.evaluate(seq20k, "doc_id"), 20_000)


def test_block_kernel_survives_sig0_birthday_collision():
    """The 10^12 enabler: two keys colliding on the full 64-bit sig0 (a
    certainty at 10^12 keys) must be salvaged by a per-block attempt that
    mixes the independent second signature — no global re-roll."""
    import numpy as np
    import pandas as pd

    from recsplit_spark.blocked import (
        _make_block_kernel,
        _working_sigs,
        parse_descriptor,
    )

    n = 1000
    rng = np.random.default_rng(0)
    sig0 = rng.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
    sig0[1] = sig0[0]  # engineered birthday collision
    sig2 = rng.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
    pdf = pd.DataFrame(
        {"__block": np.zeros(n, dtype=np.int64), "__sig": sig0, "__sig2": sig2}
    )
    kernel = _make_block_kernel(8, 128, 0, "recsplit")
    [out] = list(kernel([pdf]))
    att = int(out["attempt"].iloc[0])
    assert att >= 1  # attempt 0 (sig0-only) cannot separate the pair
    # evaluation replay: the recorded attempt's working sigs give a bijection
    desc = parse_descriptor(bytes(out["blob"].iloc[0]))
    idx = desc.evaluate_array(_working_sigs(sig0, sig2, 0, att))
    assert len(np.unique(idx)) == n and idx.min() == 0 and idx.max() == n - 1


def test_working_sigs_attempt0_matches_legacy():
    """attempt 0 must stay bit-identical to the original single-signature
    derivation (mix64(sig0 + (block+1)*GOLDEN)) — descriptor compatibility
    for every block that never needed a re-roll."""
    import numpy as np

    from recsplit_spark.blocked import _working_sigs
    from recsplit_spark.hashing import GOLDEN, mix64_inplace

    rng = np.random.default_rng(1)
    sig0 = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
    for b in (0, 5, 1023):
        legacy = mix64_inplace(
            sig0 + (np.array([b + 1], dtype=np.int64) * GOLDEN)[0]
        )
        assert np.array_equal(_working_sigs(sig0, None, b, 0), legacy)


def test_blocked_verify_bijection_in_kernel(spark, seq20k, tmp_path):
    """verify_bijection checks the bijection INSIDE the eval cogroup (one
    output row per block, no distinct shuffle of n indices — at 10^9 keys
    the countDistinct agg spill exceeded local disk). Must agree with the
    countDistinct oracle on the positive case and catch: a missing key
    (block short), an extra non-member key (block over / local collision),
    and a wrong-n load."""
    path = str(tmp_path / "bmv")
    bm = BlockedMPHFBuilder(block_log2=4, partitions=4).build(
        seq20k, "doc_id", path
    )
    res = bm.verify_bijection(seq20k, "doc_id")
    assert res == {"ok": True, "n_keys": 20_000, "n_blocks": 16}

    # dropping one key: its block sees size-1 keys -> that block fails
    res = bm.verify_bijection(seq20k.limit(19_999), "doc_id")
    assert not res["ok"] and res["n_keys"] == 19_999 and res["bad_blocks"]

    # adding a non-member key: its block is over-size (or collides) -> fails
    extra = seq20k.select("doc_id").union(
        spark.createDataFrame([("not-a-member",)], "doc_id string")
    )
    res = bm.verify_bijection(extra, "doc_id")
    assert not res["ok"] and res["n_keys"] == 20_001


def test_blocked_space_priority_max_gen3(spark, seq20k, tmp_path):
    """Blocked build with space_priority='max' stamps rule generation 3
    in every per-block descriptor and the bijection holds through
    load+evaluate (round 5; kept small — gen 3 pays ~92K
    trial-elements/key by design)."""
    from recsplit_spark.blocked import BlockedMPHF, BlockedMPHFBuilder
    from recsplit_spark.mphf import MPHFDescriptor

    path = f"{tmp_path}/b3"
    small = seq20k.limit(4_000).select("doc_id")
    BlockedMPHFBuilder(
        leaf_size=14, avg_bucket_size=512, block_log2=2, partitions=4,
        space_priority="max",
    ).build(small, "doc_id", path)
    bm = BlockedMPHF.load(spark, path)
    res = bm.verify_bijection(small, "doc_id")
    assert res["ok"] and res["n_keys"] == 4_000
    blob = (
        spark.read.parquet(f"{path}/blocks/salt={bm.salt}")
        .limit(1).collect()[0]["blob"]
    )
    assert MPHFDescriptor.from_bytes(bytes(blob)).rule_gen == 3


def test_space_priority_rejected_for_bdz():
    """space_priority only affects the recsplit rule table; silently
    ignoring it for bdz would ship same-size blocks the caller believes
    are smaller."""
    import pytest

    from recsplit_spark.blocked import BlockedMPHFBuilder

    with pytest.raises(ValueError, match="recsplit"):
        BlockedMPHFBuilder(algo="bdz", space_priority=True)
