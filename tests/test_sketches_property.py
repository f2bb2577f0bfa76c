"""Property-based monoid-law tests for the sketch family (hypothesis):
merge commutativity/associativity on arbitrary data splits, and the
per-sketch invariants that must hold for EVERY input, not just fixtures.
Complements test_sketches.py the way test_codecs_property.py complements
test_codecs.py."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from recsplit_spark.hashing import mix64
from recsplit_spark.sketches import HyperLogLog, MisraGries, ThetaSketch


def _hashes(ids):
    return mix64(np.asarray(ids, dtype=np.uint64)).view(np.int64)


hash_sets = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=0, max_size=400
)


@settings(max_examples=60, deadline=None)
@given(a=hash_sets, b=hash_sets, c=hash_sets)
def test_theta_merge_laws_bitwise(a, b, c):
    sk = ThetaSketch(k=16)

    def state(ids):
        s = sk.new_state()
        if ids:
            sk.update(s, _hashes(ids))
        return s

    sa, sb, sc = state(a), state(b), state(c)
    ab_c = sk.merge(sk.merge(sa, sb), sc)
    a_bc = sk.merge(sa, sk.merge(sb, sc))
    ba_c = sk.merge(sk.merge(sb, sa), sc)
    assert sk.to_bytes(ab_c) == sk.to_bytes(a_bc) == sk.to_bytes(ba_c)
    # and equals the state over the concatenated multiset
    assert sk.to_bytes(ab_c) == sk.to_bytes(state(a + b + c))
    # exact below capacity
    distinct = len(set(a) | set(b) | set(c))
    if distinct < sk.k:
        assert sk.estimate(ab_c) == distinct


@settings(max_examples=60, deadline=None)
@given(a=hash_sets, b=hash_sets)
def test_theta_set_ops_exact_below_capacity(a, b):
    sk = ThetaSketch(k=1024)  # > max possible distinct -> exact mode

    def state(ids):
        s = sk.new_state()
        if ids:
            sk.update(s, _hashes(ids))
        return s

    sa, sb = state(a), state(b)
    A, B = set(a), set(b)
    assert sk.union_estimate(sa, sb) == len(A | B)
    assert sk.intersect_estimate(sa, sb) == len(A & B)
    assert sk.difference_estimate(sa, sb) == len(A - B)


@settings(max_examples=40, deadline=None)
@given(
    items=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=3), min_size=0, max_size=500
    ),
    splits=st.integers(min_value=1, max_value=7),
)
def test_mg_certificate_any_split(items, splits):
    """For every input and every chunking/merge order: est <= true,
    true - est <= dec <= n/(k+1), and any item above dec is retained."""
    mg = MisraGries(k=5)
    arr = np.array(items, dtype=object)
    states = []
    for chunk in np.array_split(arr, splits):
        s = mg.new_state()
        mg.update(s, chunk)
        states.append(mg.from_bytes(mg.to_bytes(s)))
    m = states[0]
    for s in states[1:]:
        m = mg.merge(m, s)
    assert m.n == len(items)
    assert mg.error_bound(m) <= len(items) // (mg.k + 1) + 1
    import collections

    true = collections.Counter(items)
    for item, c in true.items():
        est = mg.estimate_count(m, item)
        assert 0 <= c - est <= mg.error_bound(m)
        if c > mg.error_bound(m):
            assert est > 0


@settings(max_examples=40, deadline=None)
@given(a=hash_sets, b=hash_sets)
def test_hll_merge_is_lub(a, b):
    """HLL merge is the register-wise least upper bound: merging a state
    with itself or with a subset never changes it."""
    hll = HyperLogLog(p=6)
    sa, sb = hll.new_state(), hll.new_state()
    if a:
        hll.update(sa, _hashes(a))
    if b:
        hll.update(sb, _hashes(b))
    m = hll.merge(sa, sb)
    assert hll.to_bytes(hll.merge(m, sa)) == hll.to_bytes(m)
    assert hll.to_bytes(hll.merge(m, m)) == hll.to_bytes(m)
    both = hll.new_state()
    if a + b:
        hll.update(both, _hashes(a + b))
    assert hll.to_bytes(m) == hll.to_bytes(both)
