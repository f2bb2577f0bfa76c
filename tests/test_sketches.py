"""Sketch monoid tests (no Spark): published error bounds, merge
order-independence, serialization round-trips (SURVEY §5 mapping #3)."""

import numpy as np
import pytest

from recsplit_spark.hashing import mix64
from recsplit_spark.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLL,
    MisraGries,
    TDigest,
    ThetaSketch,
)

RNG = np.random.default_rng(7)


def _hashes(n, seed=0):
    return mix64((np.arange(n) + seed * 10**9).astype(np.uint64)).view(np.int64)


# -- HLL ----------------------------------------------------------------------

@pytest.mark.parametrize("n", [100, 10_000, 500_000])
def test_hll_error_bound(n):
    hll = HyperLogLog(p=14)
    st = hll.new_state()
    hll.update(st, _hashes(n))
    est = hll.estimate(st)
    assert abs(est - n) / n < 3 * hll.relative_error  # 3 sigma


def test_hll_merge_order_independent():
    hll = HyperLogLog(p=12)
    h = _hashes(90_000)
    chunks = np.array_split(h, 7)
    states = []
    for c in chunks:
        s = hll.new_state()
        hll.update(s, c)
        states.append(s)
    ref = states[0]
    for s in states[1:]:
        ref = hll.merge(ref, s)
    perm = [states[i] for i in RNG.permutation(7)]
    alt = perm[0]
    for s in perm[1:]:
        alt = hll.merge(alt, s)
    assert hll.to_bytes(ref) == hll.to_bytes(alt)


def test_hll_serialization_roundtrip():
    hll = HyperLogLog(p=10)
    st = hll.new_state()
    hll.update(st, _hashes(1000))
    st2 = hll.from_bytes(hll.to_bytes(st))
    assert hll.estimate(st2) == hll.estimate(st)


def test_hll_duplicates_dont_inflate():
    hll = HyperLogLog(p=12)
    h = _hashes(1000)
    st = hll.new_state()
    for _ in range(5):
        hll.update(st, h)
    assert abs(hll.estimate(st) - 1000) / 1000 < 3 * hll.relative_error


# -- CMS ----------------------------------------------------------------------

def test_cms_bounds():
    cms = CountMinSketch(eps=0.001, delta=0.01)
    vals = RNG.integers(0, 200, size=50_000)
    h_all = mix64(vals.astype(np.uint64)).view(np.int64)
    st = cms.new_state()
    cms.update(st, h_all)
    uniq = np.unique(vals)
    q = cms.query_hashes(st, mix64(uniq.astype(np.uint64)).view(np.int64))
    true = np.bincount(vals)[uniq]
    assert (q >= true).all()  # never undercounts
    assert (q <= true + cms.eps * 50_000).all()


def test_cms_merge_linear():
    cms = CountMinSketch(eps=0.01, delta=0.05)
    a, b = cms.new_state(), cms.new_state()
    cms.update(a, _hashes(500))
    cms.update(b, _hashes(500))  # same values again
    m = cms.merge(a, b)
    q = cms.query_hashes(m, _hashes(500))
    assert (q >= 2).all()
    assert cms.total(m) == 1000
    st2 = cms.from_bytes(cms.to_bytes(m))
    assert (st2 == m).all()


def test_cms_inner_product_join_size_bounds():
    cms = CountMinSketch(eps=0.001, delta=0.01)
    va = RNG.integers(0, 300, size=40_000)
    vb = RNG.integers(100, 500, size=30_000)  # partial key overlap
    sa, sb = cms.new_state(), cms.new_state()
    cms.update(sa, mix64(va.astype(np.uint64)).view(np.int64))
    cms.update(sb, mix64(vb.astype(np.uint64)).view(np.int64))
    ca, cb = np.bincount(va, minlength=500), np.bincount(vb, minlength=500)
    exact = int(np.dot(ca.astype(np.int64), cb.astype(np.int64)))
    est = cms.inner_product_estimate(sa, sb)
    assert exact <= est  # one-sided, like point queries
    assert est <= exact + cms.inner_product_bound(len(va), len(vb))
    # linearity under merge: ip(a1+a2, b) per-row is ip(a1,b)+ip(a2,b),
    # so the min-over-rows estimate of a merged state still upper-bounds
    # the union stream's true inner product within the union's bound
    sa2 = cms.new_state()
    cms.update(sa2, mix64(va.astype(np.uint64)).view(np.int64))
    m = cms.merge(sa, sa2)
    est_m = cms.inner_product_estimate(m, sb)
    assert 2 * exact <= est_m
    assert est_m <= 2 * exact + cms.inner_product_bound(2 * len(va), len(vb))


def test_cms_f2_self_join():
    cms = CountMinSketch(eps=0.001, delta=0.01)
    vals = RNG.integers(0, 200, size=50_000)
    st = cms.new_state()
    cms.update(st, mix64(vals.astype(np.uint64)).view(np.int64))
    counts = np.bincount(vals).astype(np.int64)
    exact = int(np.dot(counts, counts))
    est = cms.f2_estimate(st)
    assert exact <= est <= exact + cms.inner_product_bound(len(vals), len(vals))


def test_cms_inner_product_no_int64_overflow():
    cms = CountMinSketch(eps=0.01, delta=0.05)
    a, b = cms.new_state(), cms.new_state()
    # counters near 2^40: row dot products reach ~2^80, far past int64 —
    # the estimator must switch to Python-int accumulation
    a[:, :8] = 1 << 40
    b[:, :8] = 1 << 40
    est = cms.inner_product_estimate(a, b)
    assert est == 8 * (1 << 80)
    with pytest.raises(ValueError):
        cms.inner_product_estimate(a, np.zeros((1, 2), dtype=np.int64))


# -- Frequent Directions --------------------------------------------------------

def _fd_exact_checks(fd, st, A):
    from recsplit_spark.sketches import FrequentDirections  # noqa: F401

    G = A.T @ A
    diff = G - fd.cov_estimate(st)
    eig = np.linalg.eigvalsh(diff)
    scale = max(1.0, float(np.abs(G).max()))
    assert eig.min() >= -1e-9 * scale  # 0 <= A'A - B'B
    assert eig.max() <= fd.error_certificate(st) + 1e-9 * scale
    assert fd.error_certificate(st) <= fd.published_bound(st) + 1e-12
    assert abs(st["fro2"] - float((A * A).sum())) <= 1e-6 * scale


def test_fd_certificate_and_published_bound():
    fd_rng = np.random.default_rng(11)
    A = fd_rng.normal(size=(3_000, 24))
    from recsplit_spark.sketches import FrequentDirections

    fd = FrequentDirections(d=24, ell=48)
    st = fd.new_state()
    fd.update(st, A)
    _fd_exact_checks(fd, st, A)


def test_fd_merge_tree_keeps_certificate():
    fd_rng = np.random.default_rng(12)
    A = fd_rng.normal(size=(4_000, 16))
    from recsplit_spark.sketches import FrequentDirections

    fd = FrequentDirections(d=16, ell=32)
    states = []
    for chunk in np.array_split(A, 7):
        st = fd.new_state()
        fd.update(st, chunk)
        states.append(st)
    merged = states[0]
    for s in states[1:]:
        merged = fd.merge(merged, s)
    _fd_exact_checks(fd, merged, A)
    # serialization round-trip preserves the invariants and is stable
    st2 = fd.from_bytes(fd.to_bytes(merged))
    _fd_exact_checks(fd, st2, A)
    assert fd.to_bytes(st2) == fd.to_bytes(fd.from_bytes(fd.to_bytes(st2)))


def test_fd_top_directions_find_planted_axis():
    fd_rng = np.random.default_rng(13)
    u = np.zeros(20)
    u[3] = 1.0
    A = fd_rng.normal(size=(5_000, 20)) + 40.0 * fd_rng.normal(
        size=(5_000, 1)
    ) * u
    from recsplit_spark.sketches import FrequentDirections

    fd = FrequentDirections(d=20, ell=16)
    st = fd.new_state()
    fd.update(st, A)
    _, vt = fd.top_directions(st, 1)
    assert abs(float(vt[0] @ u)) > 0.99


def test_fd_config_and_dim_mismatch_raise():
    from recsplit_spark.sketches import FrequentDirections

    fd = FrequentDirections(d=8, ell=4)
    st = fd.new_state()
    with pytest.raises(ValueError):
        fd.update(st, np.ones((3, 9)))
    other = FrequentDirections(d=8, ell=6)
    with pytest.raises(ValueError):
        other.from_bytes(fd.to_bytes(st))


# -- Bloom ----------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr():
    bl = BloomFilter(n_expected=20_000, fpr=0.01)
    members = _hashes(20_000)
    st = bl.new_state()
    bl.update(st, members)
    assert bl.contains_hashes(st, members).all()
    others = _hashes(100_000, seed=5)
    fpr = bl.contains_hashes(st, others).mean()
    assert fpr < 2.0 * bl.expected_fpr(20_000)


def test_bloom_merge_is_union():
    bl = BloomFilter(n_expected=2000, fpr=0.01)
    a, b = bl.new_state(), bl.new_state()
    ha, hb = _hashes(1000), _hashes(1000, seed=3)
    bl.update(a, ha)
    bl.update(b, hb)
    m = bl.merge(a, b)
    assert bl.contains_hashes(m, ha).all() and bl.contains_hashes(m, hb).all()
    m2 = bl.from_bytes(bl.to_bytes(bl.merge(b, a)))
    assert (m2 == m).all()


# -- KLL ----------------------------------------------------------------------

def test_kll_rank_error_bound():
    kll = KLL(k=256)
    data = RNG.normal(0, 1, 200_000)
    st = kll.new_state()
    for chunk in np.array_split(data, 10):
        kll.update(st, chunk)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = kll.quantile(st, q)
        rank_err = abs((data <= est).mean() - q)
        assert rank_err < kll.epsilon, (q, rank_err)


def test_kll_merge_error_bound():
    kll = KLL(k=256)
    data = RNG.exponential(5.0, 100_000)
    parts = np.array_split(data, 8)
    states = []
    for p in parts:
        s = kll.new_state()
        kll.update(s, p)
        states.append(kll.from_bytes(kll.to_bytes(s)))
    merged = states[0]
    for s in states[1:]:
        merged = kll.merge(merged, s)
    assert merged.count == 100_000
    for q in (0.1, 0.5, 0.9):
        est = kll.quantile(merged, q)
        assert abs((data <= est).mean() - q) < 2 * kll.epsilon


def test_kll_extremes():
    kll = KLL(k=64)
    data = np.arange(10_000, dtype=np.float64)
    st = kll.new_state()
    kll.update(st, data)
    assert kll.quantile(st, 0.0) == 0.0
    assert kll.quantile(st, 1.0) == 9999.0


# -- t-digest ----------------------------------------------------------------------

def test_tdigest_rank_error():
    td = TDigest(compression=200)
    data = RNG.lognormal(0, 2, 200_000)
    st = td.new_state()
    for chunk in np.array_split(data, 10):
        td.update(st, chunk)
    assert len(st.means) <= td.compression + 2  # size bound
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = td.quantile(st, q)
        rank_err = abs((data <= est).mean() - q)
        # k1 scale: mid-range error ~ O(1/delta), tails tighter
        assert rank_err < 4.0 / td.compression, (q, rank_err)


def test_tdigest_merge_and_serde():
    td = TDigest(compression=100)
    data = RNG.normal(10, 3, 60_000)
    parts = np.array_split(data, 6)
    states = []
    for p in parts:
        s = td.new_state()
        td.update(s, p)
        states.append(td.from_bytes(td.to_bytes(s)))
    m = states[0]
    for s in states[1:]:
        m = td.merge(m, s)
    assert m.count == 60_000
    est = td.quantile(m, 0.5)
    assert abs((data <= est).mean() - 0.5) < 0.02
    assert td.cdf(m, np.quantile(data, 0.9)) == pytest.approx(0.9, abs=0.02)


# -- Theta / KMV ----------------------------------------------------------------

def _theta_states(sk, sets):
    out = []
    for arr in sets:
        st = sk.new_state()
        sk.update(st, arr)
        out.append(st)
    return out


@pytest.mark.parametrize("n", [100, 50_000, 1_000_000])
def test_theta_estimate_bound(n):
    sk = ThetaSketch(k=1024)
    st = sk.new_state()
    sk.update(st, _hashes(n))
    est = sk.estimate(st)
    if n < sk.k:
        assert est == n  # exact mode below capacity
    else:
        assert abs(est - n) / n < 4 * sk.relative_error


def test_theta_merge_order_independent_exactly():
    sk = ThetaSketch(k=256)
    h = _hashes(100_000)
    chunks = np.array_split(h, 9)
    states = _theta_states(sk, chunks)
    ref = states[0]
    for s in states[1:]:
        ref = sk.merge(ref, s)
    perm = [states[i] for i in RNG.permutation(9)]
    alt = perm[-1]
    for s in perm[:-1]:
        alt = sk.merge(s, alt)  # opposite argument order too
    assert sk.to_bytes(ref) == sk.to_bytes(alt)  # bit-identical state


def test_theta_duplicates_dont_inflate():
    sk = ThetaSketch(k=64)
    st = sk.new_state()
    h = _hashes(500)
    for _ in range(5):
        sk.update(st, h)
    assert sk.estimate(st) == pytest.approx(sk.estimate(st))
    st2 = sk.new_state()
    sk.update(st2, np.tile(h, 10))
    assert sk.to_bytes(st) == sk.to_bytes(st2)


def test_theta_set_operations():
    sk = ThetaSketch(k=2048)
    n, overlap = 200_000, 60_000
    a = _hashes(n, seed=1)
    b = np.concatenate([a[:overlap], _hashes(n - overlap, seed=2)])
    sa, sb = _theta_states(sk, [a, b])
    tol = 5 * sk.relative_error
    union_true = 2 * n - overlap
    assert abs(sk.union_estimate(sa, sb) - union_true) / union_true < tol
    # intersection / difference error scales with the union size
    assert abs(sk.intersect_estimate(sa, sb) - overlap) < tol * union_true
    assert abs(sk.difference_estimate(sa, sb) - (n - overlap)) < tol * union_true
    jac = overlap / union_true
    assert abs(sk.jaccard_estimate(sa, sb) - jac) < tol


def test_theta_set_ops_exact_mode():
    sk = ThetaSketch(k=4096)  # both sets below k -> all answers exact
    a = _hashes(1000, seed=3)
    b = np.concatenate([a[:400], _hashes(600, seed=4)])
    sa, sb = _theta_states(sk, [a, b])
    assert sk.union_estimate(sa, sb) == 1600
    assert sk.intersect_estimate(sa, sb) == 400
    assert sk.difference_estimate(sa, sb) == 600


def test_theta_serialization_roundtrip():
    sk = ThetaSketch(k=128)
    st = sk.new_state()
    sk.update(st, _hashes(10_000))
    st2 = sk.from_bytes(sk.to_bytes(st))
    assert np.array_equal(st.r, st2.r)
    with pytest.raises(ValueError):
        ThetaSketch(k=64).from_bytes(sk.to_bytes(st))


# -- Misra-Gries ------------------------------------------------------------------

def _zipf_items(n, n_items=1000, seed=11):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n).clip(max=n_items)
    return np.array([f"tok{r}" for r in ranks], dtype=object)


def test_mg_bound_certificate():
    mg = MisraGries(k=64)
    items = _zipf_items(200_000)
    st = mg.new_state()
    for chunk in np.array_split(items, 37):
        mg.update(st, chunk)
    assert st.n == 200_000
    assert mg.error_bound(st) <= st.n // (mg.k + 1) + 1
    import collections

    true = collections.Counter(items.tolist())
    for item, true_c in true.most_common(10):
        est = mg.estimate_count(st, item)
        assert 0 <= true_c - est <= mg.error_bound(st), item
    # every frequent item (> dec) must be retained
    for item, true_c in true.items():
        if true_c > mg.error_bound(st):
            assert mg.estimate_count(st, item) > 0, item


def test_mg_merge_keeps_bound():
    mg = MisraGries(k=32)
    items = _zipf_items(120_000, seed=12)
    parts = np.array_split(items, 8)
    states = []
    for p in parts:
        s = mg.new_state()
        mg.update(s, p)
        states.append(mg.from_bytes(mg.to_bytes(s)))  # serde in the loop
    m = states[0]
    for s in states[1:]:
        m = mg.merge(m, s)
    assert m.n == 120_000
    assert mg.error_bound(m) <= m.n // (mg.k + 1) + 1
    import collections

    true = collections.Counter(items.tolist())
    for item, true_c in true.most_common(5):
        est = mg.estimate_count(m, item)
        assert 0 <= true_c - est <= mg.error_bound(m), item


def test_mg_serialization_roundtrip():
    mg = MisraGries(k=16)
    st = mg.new_state()
    mg.update(st, np.array(["a", "b", "a", "ü"] * 50, dtype=object))
    st2 = mg.from_bytes(mg.to_bytes(st))
    assert st2.counts == st.counts and st2.n == st.n and st2.dec == st.dec
    assert mg.top_items(st2, 2) == [("a", 100), ("b", 50)]


def test_theta_incremental_update_equals_bulk():
    """The full-state threshold prune must leave the state bit-identical
    to a single bulk update (and to any chunking)."""
    sk = ThetaSketch(k=128)
    h = _hashes(40_000)
    bulk = sk.new_state()
    sk.update(bulk, h)
    chunked = sk.new_state()
    for c in np.array_split(h, 113):
        sk.update(chunked, c)
    assert sk.to_bytes(bulk) == sk.to_bytes(chunked)


def test_approx_state_bytes_upper_bounds_serialized_size():
    """The size hints gate the build() pre-merge decision: every sketch's
    actual serialized state must fit its estimate (an undershoot would let
    a huge collect bypass the distributed pre-merge)."""
    from recsplit_spark.sketches import (
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        KLL,
        MisraGries,
        TDigest,
        ThetaSketch,
    )

    h = _hashes(1_000_000)
    vals = RNG.normal(100, 25, 1_000_000)
    toks = _zipf_items(200_000, n_items=50_000)

    cases = [
        (HyperLogLog(p=14), h),
        (CountMinSketch(eps=1e-4, delta=0.01), h),
        (BloomFilter(n_expected=1_000_000, fpr=0.01), h),
        (ThetaSketch(k=4096), h),
        (KLL(k=256), vals),
        (TDigest(compression=200), vals),
    ]
    for sk, data in cases:
        st = sk.new_state()
        for chunk in np.array_split(data, 10):
            r = sk.update(st, chunk)
            st = st if r is None else r
        est = sk.approx_state_bytes()
        actual = len(sk.to_bytes(st))
        assert actual <= est, (type(sk).__name__, actual, est)
    # Misra-Gries holds unbounded strings — no fixed constant upper-bounds
    # its state, so the hint must be None (conservative pre-merge), not a
    # number that long items (URLs) would overshoot
    assert MisraGries(k=256).approx_state_bytes() is None


def test_theta_restricted_cut_is_exact_above_2_53():
    """The set-op restriction cut must be the defining sketch's own k-th
    minimum by INTEGER compare: a float64 round-trip of h_max >= 2^53 can
    drift ~2^11 and exclude that very element (ADVICE r2). Construct two
    full sketches whose h_max sits just above 2^63 and check the defining
    sketch keeps exactly its own k elements."""
    from recsplit_spark.sketches import ThetaSketch
    from recsplit_spark.sketches.theta import ThetaState

    sk = ThetaSketch(k=8)
    base = np.uint64(1) << np.uint64(63)
    # a's retained set ends at base+1001 (odd: float64 rounds it away)
    ra = np.sort(np.array([base + np.uint64(2 * i) for i in range(7)]
                          + [base + np.uint64(1001)], dtype=np.uint64))
    rb = np.sort(np.array([base + np.uint64(2 * i + 1) for i in range(7)]
                          + [base + np.uint64(4001)], dtype=np.uint64))
    a, b = ThetaState(ra), ThetaState(rb)
    res_a, res_b, theta = sk._restricted(a, b)
    cut = min(ra[-1], rb[-1])  # integer compare
    assert res_a.tolist() == ra[ra <= cut].tolist()
    assert res_b.tolist() == rb[rb <= cut].tolist()
    # the defining sketch retains its own h_max (the float path could drop it)
    assert cut in np.concatenate([res_a, res_b])


def test_mg_int_fast_path_matches_generic():
    """The vectorized int64 fold (_update_int — the n-gram hash feed's hot
    path) must stay VALUE-IDENTICAL to the generic dict path: same counts,
    same n, same certified dec, under repeated updates and trims. Both
    sides are exercised through public update() — int64 arrays take the
    fast path, object arrays the generic one."""
    rng = np.random.default_rng(23)
    for k in (1, 4, 64, 1000):
        mg = MisraGries(k)
        batches = [
            np.concatenate(
                [rng.integers(0, 40, 4000), rng.integers(0, 2**62, 20000)]
            ),
            rng.integers(0, 2**62, 15000),
            rng.integers(0, 25, 500),
        ]
        fast, slow = mg.new_state(), mg.new_state()
        for b in batches:
            mg.update(fast, b.astype(np.int64))
            mg.update(slow, b.astype(object))
        assert fast.n == slow.n
        assert fast.dec == slow.dec, k
        assert fast.counts == slow.counts, k


def test_mg_int_then_string_feed_falls_back():
    """A state previously fed non-numeric string items can't ride the int
    fast path (keys aren't parseable) — update must fall back to the
    generic path, not raise."""
    mg = MisraGries(k=8)
    st = mg.new_state()
    mg.update(st, np.array(["a", "b", "a"], dtype=object))
    mg.update(st, np.arange(20, dtype=np.int64))
    assert st.n == 23
    assert mg.error_bound(st) <= st.n // (mg.k + 1) + 1


def test_mg_non_canonical_decimal_keys_fall_back():
    """Decimal-PARSABLE but non-canonical string keys ('007', '+3', ' 3')
    must force the generic path: the fast path's final dict rebuild keys
    on str(int64), which would silently rewrite '007' -> '7' and merge
    keys the generic path keeps distinct."""
    for bad in ("007", "+3", " 3", "1_0"):
        mg = MisraGries(k=8)
        fast, slow = mg.new_state(), mg.new_state()
        first = np.array([bad, bad, "7"], dtype=object)
        second = np.array([7, 3, 10], dtype=np.int64)
        mg.update(fast, first)
        mg.update(fast, second)  # int batch: must NOT canonicalize keys
        mg.update(slow, first)
        mg.update(slow, second.astype(object))  # generic path reference
        assert fast.counts == slow.counts, bad
        assert bad in fast.counts, bad


def test_mg_uint64_feed_keys_unsigned():
    """uint64 items above 2^63 must key by their UNSIGNED decimal (the
    generic-path str(item)), not the int64-wrapped negative value."""
    mg = MisraGries(k=8)
    st = mg.new_state()
    big = np.array([2**64 - 1, 2**63, 5], dtype=np.uint64)
    mg.update(st, big)
    assert str(2**64 - 1) in st.counts
    assert str(2**63) in st.counts
    assert "-1" not in st.counts and str(-(2**63)) not in st.counts


def test_mg_nulls_are_not_items():
    """MG drops nulls before counting: neither the counters nor state.n see
    them (documented contract; lineage n_rows counts raw rows instead)."""
    from recsplit_spark.sketches import MisraGries

    mg = MisraGries(k=8)
    st = mg.new_state()
    arr = np.array(["a", None, "b", "a", None, np.nan], dtype=object)
    mg.update(st, arr)
    assert st.n == 3
    assert st.counts == {"a": 2, "b": 1}
