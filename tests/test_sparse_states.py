"""Sparse/compact sketch-state serialization (round 4).

States are the shuffle currency of grouped profiling: a per-key
``states_by_key``/``profile_by_key`` table carries one serialized state
per group, and the dense encodings (16 KB HLL p=14, ~100 KB+ CMS) are
almost all zeros for small groups. ``to_bytes`` now picks the smaller of
the dense and sparse forms per state; ``from_bytes`` reads both, plus the
legacy rounds-1-3 dense bytes. Everything here is a pure serialization
change — in-memory states, update/merge kernels, and estimates are
untouched, so all existing value/byte-identity properties keep holding
through the new encoder (same state -> same bytes, deterministically).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from recsplit_spark.sketches import BloomFilter, CountMinSketch, HyperLogLog
from recsplit_spark.sketches import hll as hll_mod
from recsplit_spark.sketches import cms as cms_mod
from recsplit_spark.sketches import bloom as bloom_mod


def _hashes(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


# ---------------------------------------------------------------- HLL ----


def test_hll_small_state_serializes_sparse_and_roundtrips():
    sk = HyperLogLog(p=14)
    st = sk.new_state()
    sk.update(st, _hashes(5))
    data = sk.to_bytes(st)
    assert data[:4] == b"HLS1"
    assert len(data) < 100  # vs 16 KB dense
    back = sk.from_bytes(data)
    assert np.array_equal(back, st)
    assert sk.estimate(back) == sk.estimate(st)


def test_hll_large_state_stays_dense():
    sk = HyperLogLog(p=8)  # m=256: a few hundred distincts fill it
    st = sk.new_state()
    sk.update(st, _hashes(5000))
    data = sk.to_bytes(st)
    assert data[:4] == b"HLL1"
    assert np.array_equal(sk.from_bytes(data), st)


def test_hll_legacy_dense_bytes_still_read():
    sk = HyperLogLog(p=14)
    st = sk.new_state()
    sk.update(st, _hashes(3))
    legacy = hll_mod._HDR.pack(hll_mod._MAGIC, sk.p) + st.tobytes()
    assert np.array_equal(sk.from_bytes(legacy), st)


def test_hll_sparse_dense_merge_identical():
    sk = HyperLogLog(p=14)
    small, big = sk.new_state(), sk.new_state()
    sk.update(small, _hashes(4, seed=1))
    sk.update(big, _hashes(200_000, seed=2))
    direct = sk.merge(small.copy(), big.copy())
    via_serde = sk.merge(
        sk.from_bytes(sk.to_bytes(small)), sk.from_bytes(sk.to_bytes(big))
    )
    assert np.array_equal(direct, via_serde)
    # deterministic: same state -> same bytes regardless of history
    assert sk.to_bytes(direct) == sk.to_bytes(via_serde)


def test_hll_p18_uses_uint32_indices():
    sk = HyperLogLog(p=18)
    st = sk.new_state()
    sk.update(st, _hashes(10))
    data = sk.to_bytes(st)
    assert data[:4] == b"HLS1"
    assert np.array_equal(sk.from_bytes(data), st)


# ---------------------------------------------------------------- CMS ----


def test_cms_small_state_serializes_sparse():
    sk = CountMinSketch(eps=1e-4, delta=0.01)  # dense int64 would be ~1 MB
    st = sk.new_state()
    sk.update(st, np.repeat(_hashes(6), 3))
    data = sk.to_bytes(st)
    assert data[:4] == b"CMS3"
    assert len(data) < 1000
    assert np.array_equal(sk.from_bytes(data), st)


def test_cms_dense_state_downcasts_counts():
    sk = CountMinSketch(eps=0.05, delta=0.1)  # w=55, d=3: tiny matrix
    st = sk.new_state()
    sk.update(st, _hashes(4000))  # every counter nonzero, max < 2^16
    data = sk.to_bytes(st)
    assert data[:4] == b"CMS3"
    mode, code = data[cms_mod._HDR.size], data[cms_mod._HDR.size + 1]
    assert mode == 0 and code <= 1  # dense, uint8/uint16 counts
    assert len(data) < cms_mod._HDR.size + 2 + sk.d * sk.w * 8
    assert np.array_equal(sk.from_bytes(data), st)


def test_cms_huge_counts_roundtrip_int64():
    sk = CountMinSketch(eps=0.05, delta=0.1)
    st = sk.new_state()
    st[0, 3] = (1 << 40) + 17  # beyond uint32
    st[2, 10] = 5
    data = sk.to_bytes(st)
    assert np.array_equal(sk.from_bytes(data), st)


def test_cms_legacy_dense_bytes_still_read():
    sk = CountMinSketch(eps=0.01, delta=0.1)
    st = sk.new_state()
    sk.update(st, _hashes(50))
    legacy = cms_mod._HDR.pack(cms_mod._MAGIC, sk.d, sk.w) + st.tobytes()
    assert np.array_equal(sk.from_bytes(legacy), st)


def test_cms_wrong_config_rejected_for_both_forms():
    sk = CountMinSketch(eps=0.01, delta=0.1)
    st = sk.new_state()
    sk.update(st, _hashes(5))
    other = CountMinSketch(eps=0.02, delta=0.1)
    with pytest.raises(ValueError):
        other.from_bytes(sk.to_bytes(st))


def test_cms_merged_estimates_unchanged_through_serde():
    sk = CountMinSketch(eps=0.001, delta=0.01)
    a, b = sk.new_state(), sk.new_state()
    items = _hashes(30, seed=3)
    sk.update(a, np.repeat(items[:20], 5))
    sk.update(b, np.repeat(items[10:], 2))
    direct = sk.merge(a.copy(), b.copy())
    via = sk.merge(sk.from_bytes(sk.to_bytes(a)), sk.from_bytes(sk.to_bytes(b)))
    assert np.array_equal(direct, via)
    assert np.array_equal(
        sk.query_hashes(direct, items), sk.query_hashes(via, items)
    )


# -------------------------------------------------------------- Bloom ----


def test_bloom_small_state_serializes_sparse():
    sk = BloomFilter(n_expected=1_000_000, fpr=0.01)  # ~1.2 MB dense
    st = sk.new_state()
    keys = _hashes(8)
    sk.update(st, keys)
    data = sk.to_bytes(st)
    assert data[:4] == b"BLS1"
    assert len(data) < 1000
    back = sk.from_bytes(data)
    assert np.array_equal(back, st)
    assert bool(sk.contains_hashes(back, keys).all())


def test_bloom_full_state_stays_dense_and_legacy_reads():
    sk = BloomFilter(n_expected=100, fpr=0.01)
    st = sk.new_state()
    sk.update(st, _hashes(100))
    data = sk.to_bytes(st)
    assert data[:4] == b"BLM1"
    legacy = bloom_mod._HDR.pack(bloom_mod._MAGIC, sk.m, sk.k) + st.tobytes()
    assert np.array_equal(sk.from_bytes(legacy), st)


def test_bloom_sparse_dense_merge_identical():
    sk = BloomFilter(n_expected=500_000, fpr=0.01)
    a, b = sk.new_state(), sk.new_state()
    sk.update(a, _hashes(5, seed=4))
    sk.update(b, _hashes(400_000, seed=5))
    direct = sk.merge(a, b)
    via = sk.merge(sk.from_bytes(sk.to_bytes(a)), sk.from_bytes(sk.to_bytes(b)))
    assert np.array_equal(direct, via)


# ---------------------------------------------- grouped-profiling win ----


def test_states_by_key_shrinks_for_small_groups(spark, sf_dir):
    """The motivating regime: per-key states where most groups are small.
    The serialized table must cost ~bytes-per-distinct, not 16 KB/group."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    sk = HyperLogLog(p=14)
    rows = sk.states_by_key(docs, "doc_id", keys=("lang",)).collect()
    assert rows
    for r in rows:
        blob = bytes(r["state"])
        st = sk.from_bytes(blob)
        # each group's state must round-trip and be far below dense size
        assert len(blob) < 4096
        assert sk.to_bytes(st) == blob


# ------------------------------------------- buffered grouped partials ----


def test_elementwise_update_is_batch_split_invariant():
    """The contract behind the buffered grouped fold: one concatenated
    update must be BIT-identical to per-batch updates."""
    from recsplit_spark.sketches import ThetaSketch

    data = _hashes(50_000, seed=11)
    cuts = [0, 7, 1000, 30_000, 50_000]
    for sk in (
        HyperLogLog(p=12),
        CountMinSketch(eps=0.001, delta=0.01),
        BloomFilter(n_expected=100_000, fpr=0.01),
        ThetaSketch(k=512),
    ):
        assert sk.elementwise_update
        seq = sk.new_state()
        for a, b in zip(cuts, cuts[1:]):
            sk.update(seq, data[a:b])
        oneshot = sk.new_state()
        sk.update(oneshot, data)
        assert sk.to_bytes(seq) == sk.to_bytes(oneshot), type(sk).__name__


def test_buffered_grouped_partials_match_direct_updates(spark):
    """Per-group states through the buffered fold (small groups stay
    buffered; one group crosses its buffer cap mid-partition) equal
    reference states built by direct update."""
    import pyspark.sql.functions as F

    n_heavy, n_small = 80_000, 50  # heavy group crosses the buffer cap (state_bytes/8)
    df = spark.range(n_heavy + 10 * n_small, numPartitions=1).select(
        F.when(F.col("id") < n_heavy, F.lit("g_heavy"))
        .otherwise(F.concat(F.lit("g"), ((F.col("id") - n_heavy) / n_small).cast("int").cast("string")))
        .alias("grp"),
        F.col("id").cast("string").alias("v"),
    )
    sk = HyperLogLog(p=14)
    got = {r["grp"]: bytes(r["state"])
           for r in sk.states_by_key(df, "v", keys=("grp",)).collect()}
    rows = df.select("grp", F.xxhash64(F.col("v").cast("string")).alias("h")).collect()
    by_grp: dict[str, list[int]] = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r["h"])
    assert set(got) == set(by_grp)
    for g, hs in by_grp.items():
        ref = sk.new_state()
        sk.update(ref, np.array(hs, dtype=np.int64))
        assert got[g] == sk.to_bytes(ref), g


def test_value_sketches_keep_eager_fold():
    from recsplit_spark.sketches import KLL, MisraGries, TDigest

    assert not KLL(k=128).elementwise_update
    assert not TDigest(compression=100).elementwise_update
    assert not MisraGries(k=16).elementwise_update
