"""Product-quantization codec: ADC accuracy, code plumbing, round-trips.

Accuracy fixtures are clustered synthetic vectors (the regime PQ is for);
the ADC-vs-true-cosine tolerance is the PQ reconstruction bound in
practice, pinned empirically on the seeded fixture.
"""

import numpy as np
import pyarrow as pa
import pytest

from recsplit_spark.pipeline.pq import (
    PQCodec,
    _binary_col_to_codes,
    _chunked_argmin_l2,
    _codes_to_binary_array,
)


def _clustered(n=600, d=32, n_clusters=12, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, d))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    x = cents[rng.integers(0, n_clusters, n)] + 0.15 * rng.normal(size=(n, d))
    return x.astype(np.float64)


def _to_df(spark, x):
    values = pa.array(x.reshape(-1).astype(np.float32), type=pa.float32())
    offsets = pa.array(
        np.arange(0, (len(x) + 1) * x.shape[1], x.shape[1], dtype=np.int32)
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": pa.ListArray.from_arrays(offsets, values),
        }
    )
    return spark.createDataFrame(tbl)


def test_codes_binary_roundtrip():
    codes = np.arange(24, dtype=np.uint8).reshape(6, 4)
    arr = _codes_to_binary_array(codes)
    assert arr.type == pa.binary()
    back = _binary_col_to_codes(arr, 4)
    np.testing.assert_array_equal(back, codes)
    # sliced arrays keep the offset bookkeeping honest
    np.testing.assert_array_equal(_binary_col_to_codes(arr.slice(2, 3), 4), codes[2:5])
    # chunked input
    ch = pa.chunked_array([arr.slice(0, 3), arr.slice(3, 3)])
    np.testing.assert_array_equal(_binary_col_to_codes(ch, 4), codes)
    with pytest.raises(ValueError, match="fixed"):
        _binary_col_to_codes(pa.array([b"ab", b"abc"]), 2)
    assert _binary_col_to_codes(pa.array([], type=pa.binary()), 4).shape == (0, 4)


def test_argmin_l2_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    cb = rng.normal(size=(16, 8))
    want = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    np.testing.assert_array_equal(_chunked_argmin_l2(x, cb), want)


def test_fit_is_deterministic_and_shapes(spark):
    x = _clustered()
    df = _to_df(spark, x)
    a = PQCodec(m=4, ks=16, seed=11).fit(df, "embedding")
    b = PQCodec(m=4, ks=16, seed=11).fit(df, "embedding")
    assert a.codebooks.shape == (4, 16, 8)
    np.testing.assert_array_equal(a.codebooks, b.codebooks)


def test_dim_not_divisible_raises(spark):
    df = _to_df(spark, _clustered(d=30))
    with pytest.raises(ValueError, match="not divisible"):
        PQCodec(m=4, ks=8).fit(df, "embedding")


def test_ks_bounds():
    with pytest.raises(ValueError, match="uint8"):
        PQCodec(ks=512)


def test_adc_score_tracks_true_cosine(spark):
    x = _clustered()
    df = _to_df(spark, x)
    codec = PQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    enc = codec.encode(df, "embedding").cache()
    q = x[7]
    scored = {
        r["vec_id"]: r["pq_score"]
        for r in codec.score(enc, q).select("vec_id", "pq_score").collect()
    }
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    true = xn @ qn
    err = np.array([scored[i] - true[i] for i in range(len(x))])
    # ADC error is the projected reconstruction error; on the clustered
    # fixture with 8 subspaces x 32 codes the mean error is a few percent
    # (the worst single point sits in the inter-cluster noise tail)
    assert np.abs(err).max() < 0.35
    assert np.abs(err).mean() < 0.06
    enc.unpersist()


def test_search_rerank_recall_vs_bruteforce(spark):
    x = _clustered(n=800)
    df = _to_df(spark, x)
    codec = PQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    enc = codec.encode(df, "embedding").cache()
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    hits = total = 0
    for qid in (3, 100, 555):
        q = x[qid]
        exact = set(np.argsort(-(xn @ (q / np.linalg.norm(q))))[:10].tolist())
        got = {
            r["vec_id"]
            for r in codec.search_rerank(enc, "embedding", q, k=10).collect()
        }
        hits += len(exact & got)
        total += 10
    assert hits / total >= 0.8
    enc.unpersist()


def test_bytes_roundtrip_and_codes_identical(spark):
    x = _clustered(n=300)
    df = _to_df(spark, x)
    codec = PQCodec(m=4, ks=16, seed=9).fit(df, "embedding")
    blob = codec.to_bytes()
    back = PQCodec.from_bytes(blob)
    np.testing.assert_array_equal(back.codebooks, codec.codebooks)
    assert back.to_bytes() == blob
    a = codec.encode(df, "embedding").select("vec_id", "pq_code").collect()
    b = back.encode(df, "embedding").select("vec_id", "pq_code").collect()
    assert sorted((r["vec_id"], bytes(r["pq_code"])) for r in a) == sorted(
        (r["vec_id"], bytes(r["pq_code"])) for r in b
    )
    with pytest.raises(ValueError, match="magic"):
        PQCodec.from_bytes(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="length"):
        PQCodec.from_bytes(blob[:-4])


def test_encode_plan_has_no_shuffle(spark):
    x = _clustered(n=200)
    df = _to_df(spark, x)
    codec = PQCodec(m=4, ks=8, seed=1).fit(df, "embedding")
    plan = codec.encode(df, "embedding")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: read-encode, no shuffle


def test_ivfadc_search_recall_and_bucket_parity(spark):
    from recsplit_spark.pipeline.ann import IVFIndex, brute_force_topk
    from recsplit_spark.pipeline.pq import ivfadc_search

    x = _clustered(n=800)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=8, nprobe=4, seed=2).fit(df, "embedding")
    codec = PQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    enc = codec.encode(idx.assign(df, "embedding"), "embedding").cache()
    hits = total = 0
    for qid in (3, 100, 555):
        q = x[qid]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(df, "embedding", q, 10).collect()
        }
        got = {
            r["vec_id"]
            for r in ivfadc_search(
                idx, codec, enc, q, k=10, rerank=8, vec_col="embedding",
                id_col="vec_id",
            ).collect()
        }
        hits += len(exact & got)
        total += 10
        # the ADC funnel explores exactly the same probe-bucket set as
        # the exact IVF search — losses can only come from quantization
        probe = set(idx.probe_ids(q))
        in_bucket = {
            r["vec_id"]
            for r in ivfadc_search(idx, codec, enc, q, k=10).collect()
        }
        bucket_members = {
            r["vec_id"]
            for r in enc.filter(enc.centroid_id.isin(list(probe))).collect()
        }
        assert in_bucket <= bucket_members
    assert hits / total >= 0.8
    enc.unpersist()


def test_ivfadc_rerank_requires_vec_col(spark):
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import ivfadc_search

    x = _clustered(n=120)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=4, nprobe=2, seed=2).fit(df, "embedding")
    codec = PQCodec(m=4, ks=8, seed=5).fit(df, "embedding")
    enc = codec.encode(idx.assign(df, "embedding"), "embedding")
    with pytest.raises(ValueError, match="vec_col"):
        ivfadc_search(idx, codec, enc, x[0], k=5, rerank=4)


def test_ivfadc_partition_pruning_on_bucketed_store(spark, tmp_path):
    """Written partitioned by centroid_id, the probe IN-filter must land
    as a PartitionFilter (directory pruning) and the ADC leg must read
    only (vec_id, pq_code) — the float column never enters the scan."""
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import ivfadc_search

    x = _clustered(n=400)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=8, nprobe=3, seed=2).fit(df, "embedding")
    codec = PQCodec(m=8, ks=16, seed=5).fit(df, "embedding")
    path = str(tmp_path / "store")
    codec.encode(idx.assign(df, "embedding"), "embedding").write.partitionBy(
        "centroid_id"
    ).parquet(path)
    store = spark.read.parquet(path)
    plan = (
        ivfadc_search(idx, codec, store.select("vec_id", "pq_code", "centroid_id"), x[9], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert "embedding" not in plan.split("ReadSchema")[1].split("\n")[0]
    # rerank phase 2: the candidate-id fetch is pushed to parquet (In on
    # the id column) so row-group stats skip the non-candidate rows
    full = spark.read.parquet(path)
    plan2 = (
        ivfadc_search(
            idx, codec, full, x[9], k=5, rerank=2,
            vec_col="embedding", id_col="vec_id",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(vec_id" in plan2.split("PushedFilters")[1].split("]")[0]


def test_unfitted_raises(spark):
    df = _to_df(spark, _clustered(n=50))
    codec = PQCodec(m=4, ks=8)
    with pytest.raises(RuntimeError, match="fit"):
        codec.encode(df, "embedding")
    with pytest.raises(RuntimeError, match="fit"):
        codec.score(df, np.ones(32))
    with pytest.raises(RuntimeError, match="fit"):
        codec.to_bytes()


def test_search_many_matches_per_query_search(spark):
    from recsplit_spark.pipeline.pq import PQCodec

    x = _clustered(n=700)
    df = _to_df(spark, x)
    codec = PQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    enc = codec.encode(df, "embedding").cache()
    queries = [x[3], x[100], x[555], x[9]]
    many = codec.search_many(enc, queries, k=10).collect()
    assert len(many) == 4 * 10
    by_q = {}
    for r in many:
        by_q.setdefault(r["qid"], []).append((r["vec_id"], round(r["pq_score"], 5)))
    for qi, q in enumerate(queries):
        want = {
            (r["vec_id"], round(r["pq_score"], 5))
            for r in codec.search(enc, q, k=10).collect()
        }
        got = set(by_q[qi])
        # ties at the kth score may resolve to different ids; scores
        # themselves must agree
        assert sorted(s for _, s in got) == sorted(
            s for _, s in want
        ), qi
        # and non-tied members must coincide
        kth = min(s for _, s in want)
        assert {v for v, s in got if s > kth} == {
            v for v, s in want if s > kth
        }
    # one scan: the only exchange is the Q*k-row global reduce
    plan = (
        codec.search_many(enc, queries, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    enc.unpersist()


def test_ivfadc_search_many_matches_single_query(spark):
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import ivfadc_search, ivfadc_search_many

    x = _clustered(n=700)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=8, nprobe=3, seed=2).fit(df, "embedding")
    codec = PQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    enc = codec.encode(idx.assign(df, "embedding"), "embedding").cache()
    queries = [x[3], x[100], x[555]]
    many = ivfadc_search_many(idx, codec, enc, queries, k=8).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["qid"], []).append(
            (r["vec_id"], round(r["pq_score"], 5))
        )
    for qi, q in enumerate(queries):
        want = {
            (r["vec_id"], round(r["pq_score"], 5))
            for r in ivfadc_search(idx, codec, enc, q, k=8).collect()
        }
        got = set(by_q[qi])
        kth = min(s for _, s in want)
        assert sorted(s for _, s in got) == sorted(s for _, s in want), qi
        assert {v for v, s in got if s > kth} == {v for v, s in want if s > kth}
    enc.unpersist()


def test_ivfadc_many_rerank_semijoin_branch_row_identical(
    spark, monkeypatch
):
    """The rerank candidate fetch dispatches on |union_ids|: a literal
    IN filter below _RERANK_IN_THRESHOLD, a broadcast semi-join above
    (a Q*k*rerank-literal In expression explodes the Catalyst tree —
    128K ids at serving scale OOMed the driver). Both branches must be
    row-identical; pin the threshold to each side on the same inputs."""
    from recsplit_spark.pipeline import pq as pqmod
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import ivfadc_search_many

    x = _clustered(n=700)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=8, nprobe=3, seed=2).fit(df, "embedding")
    codec = PQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    enc = codec.encode(idx.assign(df, "embedding"), "embedding").cache()
    queries = [x[3], x[100], x[555], x[10]]

    def run():
        return sorted(
            (r["qid"], r["vec_id"], round(r["cosine"], 6))
            for r in ivfadc_search_many(
                idx, codec, enc, queries, k=6, rerank=5,
                vec_col="embedding",
            ).collect()
        )

    monkeypatch.setattr(pqmod, "_RERANK_IN_THRESHOLD", 10**9)
    via_in = run()
    monkeypatch.setattr(pqmod, "_RERANK_IN_THRESHOLD", 0)
    via_semijoin = run()
    assert via_in == via_semijoin
    assert len(via_in) == 6 * len(queries)
    enc.unpersist()


# -- residual PQ (IVFADC proper) ------------------------------------------


def _residual_setup(spark, n=800, n_cent=8, m=8, ks=16):
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import ResidualPQ

    x = _clustered(n=n)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=n_cent, nprobe=4, seed=2).fit(df, "embedding")
    codec = ResidualPQ(idx, m=m, ks=ks, seed=5).fit(df, "embedding")
    enc = codec.encode(idx.assign(df, "embedding"), "embedding")
    return x, df, idx, codec, enc


def test_residual_serde_codes_identical_and_wrong_index_refused(spark):
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import (
        PQCodec,
        ResidualPQ,
        codec_from_bytes,
    )

    x, df, idx, codec, enc = _residual_setup(spark, n=400)
    blob = codec.to_bytes()
    back = ResidualPQ.from_bytes(blob, idx)
    np.testing.assert_array_equal(back.codebooks, codec.codebooks)
    c1 = sorted(
        (r["vec_id"], r["pq_code"])
        for r in enc.select("vec_id", "pq_code").collect()
    )
    enc2 = back.encode(idx.assign(df, "embedding"), "embedding")
    c2 = sorted(
        (r["vec_id"], r["pq_code"])
        for r in enc2.select("vec_id", "pq_code").collect()
    )
    assert c1 == c2
    # magic dispatch
    assert isinstance(codec_from_bytes(blob, idx), ResidualPQ)
    raw = PQCodec(m=4, ks=8, seed=5).fit(df, "embedding")
    assert isinstance(codec_from_bytes(raw.to_bytes()), PQCodec)
    with pytest.raises(ValueError, match="requires the owning"):
        codec_from_bytes(blob)
    # a different centroid set is refused, never adapted
    other = IVFIndex(n_centroids=8, nprobe=4, seed=99).fit(df, "embedding")
    with pytest.raises(ValueError, match="different.*centroid"):
        ResidualPQ.from_bytes(blob, other)


def test_residual_adc_beats_raw_pq_accuracy(spark):
    """The point of residual encoding: on clustered data the same code
    budget tracks the true cosine tighter than raw-vector PQ (residual
    cells are much smaller than whole-space cells)."""
    from recsplit_spark.pipeline.ann import _normalize_rows

    x, df, idx, codec, enc = _residual_setup(spark, n=800, m=8, ks=16)
    raw = PQCodec(m=8, ks=16, seed=5).fit(df, "embedding")
    enc_raw = raw.encode(idx.assign(df, "embedding"), "embedding")
    xn = _normalize_rows(x.copy())
    errs = {"residual": [], "raw": []}
    for qid in (3, 100, 555):
        q = x[qid]
        qn = q / np.linalg.norm(q)
        true = {i: float(xn[i] @ qn) for i in range(len(x))}
        for name, scored in (
            ("residual", codec.score(enc, q)),
            ("raw", raw.score(enc_raw, q)),
        ):
            for r in scored.select("vec_id", "pq_score").collect():
                errs[name].append(abs(r["pq_score"] - true[r["vec_id"]]))
    mae_res = float(np.mean(errs["residual"]))
    mae_raw = float(np.mean(errs["raw"]))
    assert mae_res < mae_raw, (mae_res, mae_raw)
    # empirically ~0.068 on the seeded fixture (12 true clusters quantized
    # through 8 coarse centroids); the bound is a regression tripwire
    assert mae_res < 0.1, mae_res


def test_ivfadc_residual_search_recall_and_rerank(spark):
    from recsplit_spark.pipeline.ann import brute_force_topk
    from recsplit_spark.pipeline.pq import ivfadc_search

    x, df, idx, codec, enc = _residual_setup(spark)
    enc = enc.cache()
    hits = total = 0
    for qid in (3, 100, 555):
        q = x[qid]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(df, "embedding", q, 10).collect()
        }
        got = {
            r["vec_id"]
            for r in ivfadc_search(
                idx, codec, enc, q, k=10, rerank=8, vec_col="embedding",
                id_col="vec_id",
            ).collect()
        }
        hits += len(exact & got)
        total += 10
        # funnel containment: ADC-only results stay inside probe buckets
        probe = set(idx.probe_ids(q))
        in_bucket = {
            r["vec_id"]
            for r in ivfadc_search(idx, codec, enc, q, k=10).collect()
        }
        members = {
            r["vec_id"]
            for r in enc.filter(enc.centroid_id.isin(list(probe))).collect()
        }
        assert in_bucket <= members
    assert hits / total >= 0.8
    enc.unpersist()


def test_ivfadc_search_many_residual_matches_single(spark):
    from recsplit_spark.pipeline.pq import ivfadc_search, ivfadc_search_many

    x, df, idx, codec, enc = _residual_setup(spark)
    enc = enc.cache()
    queries = [x[3], x[100], x[555]]
    many = ivfadc_search_many(idx, codec, enc, queries, k=8).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["qid"], []).append(
            (r["vec_id"], round(r["pq_score"], 5))
        )
    for qi, q in enumerate(queries):
        want = {
            (r["vec_id"], round(r["pq_score"], 5))
            for r in ivfadc_search(idx, codec, enc, q, k=8).collect()
        }
        got = set(by_q[qi])
        kth = min(s for _, s in want)
        assert sorted(s for _, s in got) == sorted(s for _, s in want), qi
        assert {v for v, s in got if s > kth} == {v for v, s in want if s > kth}
    enc.unpersist()


def test_residual_contracts(spark):
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import ResidualPQ

    x = _clustered(n=100)
    df = _to_df(spark, x)
    with pytest.raises(ValueError, match="fitted"):
        ResidualPQ(IVFIndex(n_centroids=4))
    idx = IVFIndex(n_centroids=4, nprobe=2, seed=2).fit(df, "embedding")
    with pytest.raises(ValueError, match="ks"):
        ResidualPQ(idx, ks=512)
    codec = ResidualPQ(idx, m=5, ks=8)
    with pytest.raises(ValueError, match="divisible"):
        codec.fit(df, "embedding")
    codec = ResidualPQ(idx, m=4, ks=8)
    with pytest.raises(RuntimeError, match="fit"):
        codec.encode(idx.assign(df, "embedding"), "embedding")


# -- OPQ (parametric, Ge et al. 2014) ---------------------------------------


def _anisotropic(n=800, d=32, seed=3):
    """Geometric variance ladder + a fixed dense mixing rotation, so the
    energy is both skewed AND smeared across the naive subspace
    boundaries — the regime OPQ exists for."""
    rng = np.random.default_rng(seed)
    scales = 2.0 ** (-np.arange(d) / 4.0)
    x = rng.normal(size=(n, d)) * scales
    mix, _ = np.linalg.qr(np.random.default_rng(9).normal(size=(d, d)))
    return (x @ mix).astype(np.float64)


def test_opq_rotation_is_orthogonal_and_allocation_balances():
    from recsplit_spark.pipeline.pq import _eigen_allocation

    evals = 2.0 ** (-np.arange(16) / 2.0)
    perm = _eigen_allocation(evals, 4)
    assert sorted(perm) == list(range(16))
    # per-subspace log-variance sums balance far better than contiguous
    lg = np.log(evals)
    spread = lambda p: np.ptp([lg[p[i * 4:(i + 1) * 4]].sum() for i in range(4)])
    assert spread(perm) < spread(np.arange(16)) / 2


def test_opq_beats_plain_pq_on_anisotropic_data(spark):
    from recsplit_spark.pipeline.ann import _normalize_rows
    from recsplit_spark.pipeline.pq import OPQCodec

    x = _anisotropic()
    df = _to_df(spark, x)
    opq = OPQCodec(m=8, ks=16, seed=5).fit(df, "embedding")
    raw = PQCodec(m=8, ks=16, seed=5).fit(df, "embedding")
    # the fitted rotation is orthogonal (within f32 quantization)
    rt = opq.rotation @ opq.rotation.T
    np.testing.assert_allclose(rt, np.eye(x.shape[1]), atol=1e-5)
    enc_o = opq.encode(df, "embedding")
    enc_r = raw.encode(df, "embedding")
    xn = _normalize_rows(x.copy())
    errs = {"opq": [], "raw": []}
    for qid in (3, 100, 555):
        q = x[qid]
        qn = q / np.linalg.norm(q)
        true = {i: float(xn[i] @ qn) for i in range(len(x))}
        for name, scored in (("opq", opq.score(enc_o, q)),
                             ("raw", raw.score(enc_r, q))):
            for r in scored.select("vec_id", "pq_score").collect():
                errs[name].append(abs(r["pq_score"] - true[r["vec_id"]]))
    mae_o = float(np.mean(errs["opq"]))
    mae_r = float(np.mean(errs["raw"]))
    assert mae_o < 0.7 * mae_r, (mae_o, mae_r)


def test_opq_serde_and_inherited_search_surfaces(spark):
    from recsplit_spark.pipeline.ann import IVFIndex, brute_force_topk
    from recsplit_spark.pipeline.pq import (
        OPQCodec,
        codec_from_bytes,
        ivfadc_search,
        ivfadc_search_many,
    )

    x = _clustered(n=600)
    df = _to_df(spark, x)
    opq = OPQCodec(m=8, ks=32, seed=5).fit(df, "embedding")
    back = codec_from_bytes(opq.to_bytes())
    assert isinstance(back, OPQCodec)
    np.testing.assert_array_equal(back.rotation, opq.rotation)
    np.testing.assert_array_equal(back.codebooks, opq.codebooks)
    idx = IVFIndex(n_centroids=8, nprobe=4, seed=2).fit(df, "embedding")
    enc = opq.encode(idx.assign(df, "embedding"), "embedding").cache()
    c1 = sorted((r["vec_id"], r["pq_code"])
                for r in enc.select("vec_id", "pq_code").collect())
    c2 = sorted(
        (r["vec_id"], r["pq_code"])
        for r in back.encode(df, "embedding").select("vec_id", "pq_code").collect()
    )
    assert c1 == c2
    # inherited funnel: recall through rerank + batched parity
    q = x[100]
    exact = {r["vec_id"] for r in brute_force_topk(df, "embedding", q, 10).collect()}
    got = {
        r["vec_id"]
        for r in ivfadc_search(idx, opq, enc, q, k=10, rerank=8,
                               vec_col="embedding", id_col="vec_id").collect()
    }
    assert len(exact & got) >= 7
    many = ivfadc_search_many(idx, opq, enc, [q], k=8).collect()
    single = {
        (r["vec_id"], round(r["pq_score"], 5))
        for r in ivfadc_search(idx, opq, enc, q, k=8).collect()
    }
    got_many = {(r["vec_id"], round(r["pq_score"], 5)) for r in many}
    kth = min(s for _, s in single)
    assert sorted(s for _, s in got_many) == sorted(s for _, s in single)
    assert {v for v, s in got_many if s > kth} == {v for v, s in single if s > kth}
    enc.unpersist()


def test_opq_fit_from_fd_covariance(spark):
    """The whole-corpus rotation source: an FD sketch's cov_estimate
    feeds fit(cov=...) — the rotation stays orthogonal and the codec
    still beats raw PQ on the anisotropic fixture, within ~the
    sample-covariance OPQ's error."""
    from recsplit_spark.pipeline.ann import _normalize_rows
    from recsplit_spark.pipeline.pq import OPQCodec
    from recsplit_spark.sketches.fd import FrequentDirections

    x = _anisotropic()
    df = _to_df(spark, x)
    xn = _normalize_rows(x.copy())
    fd = FrequentDirections(d=x.shape[1], ell=24)
    st = fd.new_state()
    fd.update(st, xn)
    opq_fd = OPQCodec(m=8, ks=16, seed=5).fit(
        df, "embedding", cov=fd.cov_estimate(st)
    )
    rt = opq_fd.rotation @ opq_fd.rotation.T
    np.testing.assert_allclose(rt, np.eye(x.shape[1]), atol=1e-5)
    raw = PQCodec(m=8, ks=16, seed=5).fit(df, "embedding")
    enc_o = opq_fd.encode(df, "embedding")
    enc_r = raw.encode(df, "embedding")
    errs = {"opq": [], "raw": []}
    for qid in (3, 100, 555):
        q = x[qid]
        qn = q / np.linalg.norm(q)
        true = {i: float(xn[i] @ qn) for i in range(len(x))}
        for name, scored in (("opq", opq_fd.score(enc_o, q)),
                             ("raw", raw.score(enc_r, q))):
            for r in scored.select("vec_id", "pq_score").collect():
                errs[name].append(abs(r["pq_score"] - true[r["vec_id"]]))
    assert float(np.mean(errs["opq"])) < 0.8 * float(np.mean(errs["raw"]))
    with pytest.raises(ValueError, match="cov shape"):
        OPQCodec(m=8, ks=16).fit(df, "embedding", cov=np.eye(3))


# -- SQ8 scalar quantization -------------------------------------------------


def test_sq8_near_exact_scores_and_serde(spark):
    from recsplit_spark.pipeline.ann import _normalize_rows
    from recsplit_spark.pipeline.pq import SQ8Codec, codec_from_bytes

    x = _clustered(n=500)
    df = _to_df(spark, x)
    sq = SQ8Codec(seed=5).fit(df, "embedding")
    assert sq.m == x.shape[1] and sq.codebooks.shape == (x.shape[1], 256, 1)
    enc = sq.encode(df, "embedding").cache()
    # d-byte codes (4x compression at float32)
    assert all(len(r["pq_code"]) == x.shape[1]
               for r in enc.select("pq_code").limit(5).collect())
    xn = _normalize_rows(x.copy())
    q = x[7]
    qn = q / np.linalg.norm(q)
    true = xn @ qn
    scored = {
        r["vec_id"]: r["pq_score"]
        for r in sq.score(enc, q).select("vec_id", "pq_score").collect()
    }
    err = np.abs(np.array([scored[i] - true[i] for i in range(len(x))]))
    # 255-step per-dim grid: ~0.1% scale error, ~30x tighter than the
    # m=8 PQ bound on the same fixture
    assert err.max() < 0.01, err.max()
    assert err.mean() < 0.002, err.mean()
    # top-1 of ADC search is the query itself, no rerank needed
    top = sq.search(enc, q, k=3).collect()
    assert top[0]["vec_id"] == 7

    back = codec_from_bytes(sq.to_bytes())
    assert isinstance(back, SQ8Codec)
    np.testing.assert_array_equal(back.codebooks, sq.codebooks)
    c1 = sorted((r["vec_id"], r["pq_code"])
                for r in enc.select("vec_id", "pq_code").collect())
    c2 = sorted(
        (r["vec_id"], r["pq_code"])
        for r in back.encode(df, "embedding").select("vec_id", "pq_code").collect()
    )
    assert c1 == c2
    enc.unpersist()
    with pytest.raises(ValueError, match="length"):
        codec_from_bytes(sq.to_bytes()[:-4])


def test_sq8_inherited_ivfadc_and_search_many(spark):
    from recsplit_spark.pipeline.ann import IVFIndex, brute_force_topk
    from recsplit_spark.pipeline.pq import (
        SQ8Codec,
        ivfadc_search,
        ivfadc_search_many,
    )

    x = _clustered(n=600)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=8, nprobe=4, seed=2).fit(df, "embedding")
    sq = SQ8Codec(seed=5).fit(df, "embedding")
    enc = sq.encode(idx.assign(df, "embedding"), "embedding").cache()
    q = x[100]
    exact = {r["vec_id"] for r in brute_force_topk(df, "embedding", q, 10).collect()}
    # SQ8 is near-exact, so even WITHOUT rerank the in-probe recall is
    # essentially the IVF pruning recall
    got = {r["vec_id"] for r in ivfadc_search(idx, sq, enc, q, k=10).collect()}
    assert len(exact & got) >= 7
    many = ivfadc_search_many(idx, sq, enc, [q], k=8).collect()
    single = {
        (r["vec_id"], round(r["pq_score"], 5))
        for r in ivfadc_search(idx, sq, enc, q, k=8).collect()
    }
    got_many = {(r["vec_id"], round(r["pq_score"], 5)) for r in many}
    kth = min(s for _, s in single)
    assert sorted(s for _, s in got_many) == sorted(s for _, s in single)
    assert {v for v, s in got_many if s > kth} == {v for v, s in single if s > kth}
    enc.unpersist()


def test_residual_rejects_out_of_range_centroid_ids(spark):
    """A sentinel -1 centroid id must fail loudly, not wrap to the last
    centroid via numpy indexing (silent code corruption)."""
    from pyspark.sql import functions as F

    x, df, idx, codec, enc = _residual_setup(spark, n=120)
    bad = idx.assign(df, "embedding").withColumn(
        "centroid_id", F.lit(-1).cast("int")
    )
    with pytest.raises(Exception, match="out of range"):
        codec.encode(bad, "embedding").collect()
    bad_enc = enc.withColumn("centroid_id", F.lit(-1).cast("int"))
    with pytest.raises(Exception, match="out of range"):
        codec.score(bad_enc, x[0]).collect()


def test_opq_rotate_composition_with_residual_ivfadc(spark):
    """The full OPQ+IVFADC stack: rotate once at ingest, fit IVF and a
    ResidualPQ on the ROTATED column, search with the rotated query.
    Rotation preserves cosine, so exact top-k over the rotated column
    equals the original's, and the funnel recall carries over."""
    from recsplit_spark.pipeline.ann import IVFIndex, brute_force_topk
    from recsplit_spark.pipeline.pq import (
        OPQCodec,
        ResidualPQ,
        ivfadc_search,
    )

    x = _clustered(n=600)
    df = _to_df(spark, x)
    opq = OPQCodec(m=8, ks=16, seed=5).fit(df, "embedding")
    rot_df = opq.rotate(df, "embedding", out_col="remb").cache()
    # cosine invariance under the rotation (same ids, same values)
    q = x[100]
    rq = opq.rotate_query(q)
    orig = [(r["vec_id"], round(r["cosine"], 4))
            for r in brute_force_topk(df, "embedding", q, 10).collect()]
    rot = [(r["vec_id"], round(r["cosine"], 4))
           for r in brute_force_topk(rot_df, "remb", rq, 10).collect()]
    assert {v for v, _ in orig} == {v for v, _ in rot}
    assert all(abs(a - b) < 2e-3 for (_, a), (_, b) in zip(orig, rot))

    idx = IVFIndex(n_centroids=8, nprobe=4, seed=2).fit(rot_df, "remb")
    codec = ResidualPQ(idx, m=8, ks=16, seed=5).fit(rot_df, "remb")
    enc = codec.encode(idx.assign(rot_df, "remb"), "remb").cache()
    exact = {v for v, _ in orig}
    got = {
        r["vec_id"]
        for r in ivfadc_search(
            idx, codec, enc, rq, k=10, rerank=8,
            vec_col="remb", id_col="vec_id",
        ).collect()
    }
    assert len(exact & got) >= 7, (exact, got)
    enc.unpersist()
    rot_df.unpersist()


def test_ivfadc_search_many_rerank_matches_single_query(spark):
    """Batched two-phase funnel == per-query ivfadc_search(rerank=r):
    same ids, same exact cosines, for both codec kinds."""
    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.pq import (
        ResidualPQ,
        ivfadc_search,
        ivfadc_search_many,
    )

    x = _clustered(n=600)
    df = _to_df(spark, x)
    idx = IVFIndex(n_centroids=8, nprobe=4, seed=2).fit(df, "embedding")
    for codec in (
        PQCodec(m=8, ks=32, seed=5).fit(df, "embedding"),
        ResidualPQ(idx, m=8, ks=32, seed=5).fit(df, "embedding"),
    ):
        enc = codec.encode(idx.assign(df, "embedding"), "embedding").cache()
        queries = [x[3], x[100], x[555]]
        many = ivfadc_search_many(
            idx, codec, enc, queries, k=6, rerank=4, vec_col="embedding"
        ).collect()
        by_q = {}
        for r in many:
            by_q.setdefault(r["qid"], []).append(
                (r["vec_id"], round(r["cosine"], 5))
            )
        for qi, q in enumerate(queries):
            want = [
                (r["vec_id"], round(r["cosine"], 5))
                for r in ivfadc_search(
                    idx, codec, enc, q, k=6, rerank=4,
                    vec_col="embedding", id_col="vec_id",
                ).collect()
            ]
            assert sorted(by_q[qi]) == sorted(want), qi
        with pytest.raises(ValueError, match="vec_col"):
            ivfadc_search_many(idx, codec, enc, queries, k=6, rerank=4)
        enc.unpersist()


def test_codec_family_serde_property():
    """Pure-numpy serde property sweep over the whole codec family:
    from_bytes(to_bytes(c)) reproduces codebooks/rotation/range bit-for-
    bit and re-serializes to the identical blob, across random shapes."""
    from recsplit_spark.pipeline.pq import (
        OPQCodec,
        PQCodec,
        ResidualPQ,
        SQ8Codec,
        codec_from_bytes,
    )

    rng = np.random.default_rng(0)

    class _FakeIndex:
        def __init__(self, k, d):
            self.centroids = rng.normal(size=(k, d))

    f32 = lambda a: a.astype(np.float32).astype(np.float64)
    for m, ks, dsub in ((4, 16, 2), (8, 256, 8), (1, 2, 5)):
        c = PQCodec(m=m, ks=ks, iters=3, seed=int(rng.integers(1, 99)))
        c.codebooks = f32(rng.normal(size=(m, ks, dsub)))
        back = codec_from_bytes(c.to_bytes())
        assert type(back) is PQCodec
        np.testing.assert_array_equal(back.codebooks, c.codebooks)
        assert back.to_bytes() == c.to_bytes()

        d = m * dsub
        o = OPQCodec(m=m, ks=ks, iters=3, seed=1)
        o.codebooks = f32(rng.normal(size=(m, ks, dsub)))
        q_, _ = np.linalg.qr(rng.normal(size=(d, d)))
        o.rotation = f32(q_)
        back = codec_from_bytes(o.to_bytes())
        assert type(back) is OPQCodec
        np.testing.assert_array_equal(back.rotation, o.rotation)
        np.testing.assert_array_equal(back.codebooks, o.codebooks)
        assert back.to_bytes() == o.to_bytes()

        idx = _FakeIndex(6, d)
        r = ResidualPQ(idx, m=m, ks=ks, iters=3, seed=2)
        r.codebooks = f32(rng.normal(size=(m, ks, dsub)))
        back = ResidualPQ.from_bytes(r.to_bytes(), idx)
        np.testing.assert_array_equal(back.codebooks, r.codebooks)
        assert back.to_bytes() == r.to_bytes()
        with pytest.raises(ValueError, match="different"):
            ResidualPQ.from_bytes(r.to_bytes(), _FakeIndex(6, d))

        s = SQ8Codec(seed=3)
        s._set_range(rng.normal(size=d), np.abs(rng.normal(size=d)) + 1e-4)
        back = codec_from_bytes(s.to_bytes())
        assert type(back) is SQ8Codec
        np.testing.assert_array_equal(back.codebooks, s.codebooks)
        np.testing.assert_array_equal(back.vmin, s.vmin)
        np.testing.assert_array_equal(back.scale, s.scale)
        assert back.to_bytes() == s.to_bytes()
