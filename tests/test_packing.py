"""Sequence packing: reconstruction, capacity/fill invariants,
determinism under repartitioning."""

import numpy as np
import pytest

from recsplit_spark.pipeline.packing import pack_bins, pack_concat


def _docs(seed=3, n=400, max_len=30):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = int(rng.integers(0, max_len + 1))
        out.append((f"d{i:04d}", rng.integers(0, 1000, ln).tolist()))
    return out


def _df(spark, docs, parts=5):
    return spark.createDataFrame(
        docs, "doc_id string, tokens array<int>"
    ).repartition(parts)


def _segments(rows):
    """Per doc(-part) id: list of (bin pid, ordinal, token segment)."""
    segs = {}
    for r in rows:
        toks = np.asarray(r["tokens"], dtype=np.int64)
        starts = list(r["doc_starts"]) + [len(toks)]
        pid, ordn = r["bin_id"].split("-")
        for j, d in enumerate(r["doc_ids"]):
            seg = toks[starts[j] : starts[j + 1]]
            segs.setdefault(d, []).append((pid, int(ordn), seg))
    return segs


def test_pack_bins_invariants_and_reconstruction(spark):
    cap = 50
    docs = _docs()
    by_id = {d: t for d, t in docs}
    rows = pack_bins(_df(spark, docs), cap, long_doc="split").collect()
    # capacity + pad bookkeeping
    for r in rows:
        assert len(r["tokens"]) == r["n_tok"] <= cap
        assert r["pad"] == cap - r["n_tok"]
        assert len(r["doc_ids"]) == len(r["doc_starts"])
    # every doc appears whole exactly once (split parts reassemble)
    segs = _segments(rows)
    seen = {}
    for d, parts in segs.items():
        assert len(parts) == 1, f"{d} in multiple bins"
        base, _, idx = d.partition("#part")
        seen.setdefault(base, []).append((int(idx or 0), parts[0][2]))
    assert sorted(seen) == sorted(by_id)
    for base, chunks in seen.items():
        got = np.concatenate(
            [c for _, c in sorted(chunks, key=lambda t: t[0])]
        ) if chunks else np.empty(0)
        assert got.tolist() == by_id[base]
    # any-fit guarantee: at most one sub-half bin per partition
    from collections import Counter

    low = Counter()
    for r in rows:
        if r["n_tok"] < cap / 2:
            low[r["bin_id"].split("-")[0]] += 1
    assert all(v <= 1 for v in low.values()), low


def test_pack_bins_deterministic_across_partitioning(spark):
    cap = 64
    docs = _docs(seed=9)
    a = pack_bins(_df(spark, docs, parts=3), cap).collect()
    b = pack_bins(_df(spark, docs, parts=11), cap).collect()
    key = lambda r: (r["bin_id"], list(r["doc_ids"]), list(r["tokens"]))
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_pack_bins_long_doc_modes(spark):
    docs = [("a", list(range(120))), ("b", list(range(10)))]
    df = _df(spark, docs, parts=1)
    with pytest.raises(Exception, match="tokens > capacity"):
        pack_bins(df, 50, long_doc="error").collect()
    rows = pack_bins(df, 50, long_doc="truncate").collect()
    segs = _segments(rows)
    assert segs["a"][0][2].tolist() == list(range(50))
    with pytest.raises(ValueError, match="long_doc"):
        pack_bins(df, 50, long_doc="chop")
    with pytest.raises(ValueError, match="capacity"):
        pack_bins(df, 0)


def test_pack_concat_invariants_and_reconstruction(spark):
    cap = 48
    docs = _docs(seed=17, n=300)
    by_id = {d: t for d, t in docs}
    total = sum(len(t) for _, t in docs)
    rows = pack_concat(_df(spark, docs), cap).collect()
    assert sum(r["n_tok"] for r in rows) == total
    # all but the last bin per partition are exactly full
    from collections import defaultdict

    per_pid = defaultdict(list)
    for r in rows:
        pid, ordn = r["bin_id"].split("-")
        per_pid[pid].append((int(ordn), r["n_tok"]))
    for pid, lst in per_pid.items():
        lst.sort()
        assert all(n == cap for _, n in lst[:-1]), pid
        assert 1 <= lst[-1][1] <= cap
    # every nonempty doc reassembles from its ordered segments
    segs = _segments(rows)
    for d, parts in segs.items():
        got = np.concatenate(
            [s for _, _, s in sorted(parts, key=lambda t: (t[0], t[1]))]
        )
        assert got.tolist() == by_id[d], d
    nonempty = {d for d, t in docs if len(t) > 0}
    assert set(segs) == nonempty  # empty docs carry no segment


def test_pack_concat_deterministic_across_partitioning(spark):
    cap = 32
    docs = _docs(seed=21, n=200)
    a = pack_concat(_df(spark, docs, parts=2), cap).collect()
    b = pack_concat(_df(spark, docs, parts=7), cap).collect()
    key = lambda r: (r["bin_id"], list(r["doc_ids"]), list(r["tokens"]))
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_packing_rejects_wide_token_types(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3])], "doc_id string, tokens array<bigint>"
    )
    with pytest.raises(ValueError, match="int32-or-narrower"):
        pack_bins(df, 8)
    with pytest.raises(ValueError, match="int32-or-narrower"):
        pack_concat(df, 8)
