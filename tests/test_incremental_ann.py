"""IncrementalANN: appendable IVF-bucketed vector store. Pins the NEW
contracts: appends never touch old vectors, search over the union
matches search over a one-shot assign of the same corpus, the centroid
fingerprint manifest refuses a different index, orphaned generation dirs
stay invisible, and the stream-replay marker rides the lineage."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recsplit_spark.pipeline.ann import IVFIndex
from recsplit_spark.pipeline.incremental_ann import IncrementalANN


def _emb(spark, lo, hi, dim=16):
    rows = []
    for i in range(lo, hi):
        rng = np.random.default_rng(i)
        rows.append((i, rng.standard_normal(dim).astype(float).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def fitted(spark):
    base = _emb(spark, 0, 600)
    return IVFIndex(n_centroids=8, nprobe=3).fit(base, "embedding"), base


def test_append_search_matches_oneshot_assign(spark, tmp_path, fitted):
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/ann", index=idx)
    m0 = inc.append(base.filter(F.col("vec_id") < 200), "vec_id", "embedding")
    m1 = inc.append(base.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 400)))
    m2 = inc.append(base.filter(F.col("vec_id") >= 400))
    assert [m["gen"] for m in (m0, m1, m2)] == [0, 1, 2]
    assert inc.total_vectors(spark) == 600

    oneshot = idx.assign(base, "embedding").cache()
    oneshot.count()
    for qi in (3, 150, 450):
        q = np.random.default_rng(qi).standard_normal(16)
        want = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in idx.search(oneshot, "embedding", q, k=10).collect()
        ]
        got = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in inc.search(spark, q, k=10).collect()
        ]
        assert got == want
    oneshot.unpersist()

    # reopen without the index object: reloads from the path
    inc2 = IncrementalANN(f"{tmp_path}/ann")
    q = np.random.default_rng(3).standard_normal(16)
    assert inc2.search(spark, q, k=5).count() == 5


def test_manifest_refuses_different_centroids(spark, tmp_path, fitted):
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/ann", index=idx)
    inc.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding")

    other = IVFIndex(n_centroids=8, nprobe=3, seed=99).fit(
        base, "embedding"
    )
    bad = IncrementalANN(f"{tmp_path}/ann", index=other)
    with pytest.raises(RuntimeError, match="manifest mismatch"):
        bad.append(base.filter(F.col("vec_id") >= 100), "vec_id", "embedding")


def test_orphan_generation_invisible(spark, tmp_path, fitted):
    """A gen dir without its lineage row (crash between payload and
    lineage writes) must not be read — and the next append overwrites
    its slot."""
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/ann", index=idx)
    inc.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding")
    # orphan: write a would-be gen=1 payload with NO lineage row
    idx.assign(
        base.filter(F.col("vec_id") >= 500).select("vec_id", "embedding"),
        "embedding",
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{tmp_path}/ann/vectors/gen=1"
    )
    assert inc.total_vectors(spark) == 100
    assert inc.vectors(spark).count() == 100  # orphan invisible
    m = inc.append(
        base.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    )
    assert m["gen"] == 1  # slot reused
    assert inc.vectors(spark).count() == 150


def test_stream_replay_marker(spark, tmp_path, fitted):
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/ann", index=idx)
    m = inc.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding",
                   stream_batch_id=0)
    assert m["gen"] == 0 and not m["skipped_replay"]
    r = inc.append(base.filter(F.col("vec_id") < 100), stream_batch_id=0)
    assert r["skipped_replay"] and inc.total_vectors(spark) == 100
    m1 = inc.append(
        base.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 160)),
        stream_batch_id=1,
    )
    assert m1["gen"] == 1 and inc.last_stream_batch_id(spark) == 1


def test_search_plan_prunes_partitions(spark, tmp_path, fitted):
    """The probe-set IN-filter must reach the scan as a partition filter
    over centroid_id — at 10^12 vectors this is the difference between
    reading nprobe/k of the store and all of it."""
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/ann", index=idx)
    inc.append(base, "vec_id", "embedding")
    q = np.random.default_rng(1).standard_normal(16)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        inc.search(spark, q, k=5).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [centroid_id" in plan, plan


def test_streaming_ann_ingest_survives_checkpoint_loss(spark, tmp_path, fitted):
    """Stream ingest commits one generation per micro-batch; losing the
    streaming checkpoint (full source replay) commits nothing twice and
    search results are unchanged."""
    import pandas as pd

    from recsplit_spark.streaming import StreamingANNIngest

    idx, base = fitted
    src = tmp_path / "src"
    src.mkdir()
    pdf = base.toPandas()
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 600)]):
        pd.DataFrame(pdf[(pdf.vec_id >= lo) & (pdf.vec_id < hi)]).to_parquet(
            src / f"part-{i}.parquet", index=False
        )

    def stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    store = IncrementalANN(f"{tmp_path}/ann", index=idx)
    ing = StreamingANNIngest(store, "vec_id", "embedding")
    q = ing.start(stream(), checkpoint_dir=f"{tmp_path}/ckpt1")
    q.awaitTermination(180)
    assert len(ing.metrics) == 3
    assert store.total_vectors(spark) == 600
    qv = np.random.default_rng(9).standard_normal(16)
    want = [r["vec_id"] for r in store.search(spark, qv, k=5).collect()]

    ing2 = StreamingANNIngest(IncrementalANN(f"{tmp_path}/ann"), "vec_id",
                              "embedding")
    q2 = ing2.start(stream(), checkpoint_dir=f"{tmp_path}/ckpt2")
    q2.awaitTermination(180)
    assert all(m["skipped_replay"] for m in ing2.metrics)
    store3 = IncrementalANN(f"{tmp_path}/ann")
    assert store3.total_vectors(spark) == 600
    assert [r["vec_id"] for r in store3.search(spark, qv, k=5).collect()] == want


def test_empty_batch_is_noop(spark, tmp_path, fitted):
    """An all-dup nightly batch leaves an empty survivor set; the ANN
    stage must no-op (a 0-row partitionBy write leaves no data files, so
    committing it would poison later reads)."""
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/ann", index=idx)
    inc.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding")
    m = inc.append(base.filter(F.col("vec_id") < 0))  # empty
    assert m["gen"] is None and m["n"] == 0
    assert inc.total_vectors(spark) == 100
    assert inc.vectors(spark).count() == 100


def _clustered_emb(spark, dim=16):
    """Planted near-dup clusters: members of a cluster are tiny
    perturbations of a base vector (cosine ~0.999); distinct docs are
    independent gaussians (cosine ~0)."""
    rows = []

    def base(c):
        return np.random.default_rng(1000 + c).standard_normal(dim)

    def member(vid, c, variant):
        v = base(c) + 0.02 * np.random.default_rng(vid).standard_normal(dim)
        return (vid, v.astype(float).tolist())

    # batch 0: cluster A {0,1}, uniques 2,3 · batch 1: A-copy 10,
    # cluster B {11,12}, unique 13 · batch 2: A-copy 20, B-copy 21, unique 22
    rows += [member(0, 0, 0), member(1, 0, 1), (2, np.random.default_rng(2).standard_normal(dim).tolist()), (3, np.random.default_rng(3).standard_normal(dim).tolist())]
    rows += [member(10, 0, 2), member(11, 1, 0), member(12, 1, 1), (13, np.random.default_rng(13).standard_normal(dim).tolist())]
    rows += [member(20, 0, 3), member(21, 1, 2), (22, np.random.default_rng(22).standard_normal(dim).tolist())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_append_dedup_semantic(spark, tmp_path, fitted):
    idx, base = fitted
    emb = _clustered_emb(spark)
    store = IncrementalANN(f"{tmp_path}/sd", index=idx)

    b0 = emb.filter(F.col("vec_id") < 10)
    kept0, m0 = store.append_dedup(b0, "vec_id", "embedding",
                                   threshold=0.9, stream_batch_id=0)
    assert sorted(r["vec_id"] for r in kept0.collect()) == [0, 2, 3]
    assert m0["n_clusters"] == 1 and m0["n_matched_old"] == 0

    b1 = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    kept1, m1 = store.append_dedup(b1, threshold=0.9, stream_batch_id=1)
    assert sorted(r["vec_id"] for r in kept1.collect()) == [11, 13]
    assert m1["n_matched_old"] == 1  # 10 hit kept vector 0

    b2 = emb.filter(F.col("vec_id") >= 20)
    kept2, m2 = store.append_dedup(b2, threshold=0.9, stream_batch_id=2)
    assert sorted(r["vec_id"] for r in kept2.collect()) == [22]
    assert m2["n_matched_old"] == 2

    assert store.total_vectors(spark) == 6
    # the deduped store still searches: the kept A-rep is vec 0
    q = np.array(emb.filter(F.col("vec_id") == 20).collect()[0]["embedding"])
    top = store.search(spark, q, k=1).collect()[0]
    assert top["vec_id"] == 0 and top["cosine"] > 0.9

    # replay of batch 1: nothing recommitted, kept recomputed from state
    kept_r, m_r = store.append_dedup(b1, threshold=0.9, stream_batch_id=1)
    assert m_r["skipped_replay"]
    assert sorted(r["vec_id"] for r in kept_r.collect()) == [11, 13]
    assert store.total_vectors(spark) == 6


def test_pq_sidecar_append_and_search_adc(spark, tmp_path, fitted):
    """Codec-pinned store: every generation carries pq_code, search_adc
    over the union matches ivfadc_search over a one-shot assign+encode
    of the same corpus, and a reopen without the codec object lazy-loads
    it from the path."""
    from recsplit_spark.pipeline.pq import PQCodec, ivfadc_search

    idx, base = fitted
    codec = PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")
    inc = IncrementalANN(f"{tmp_path}/pqann", index=idx, codec=codec)
    inc.append(base.filter(F.col("vec_id") < 300), "vec_id", "embedding")
    inc.append(base.filter(F.col("vec_id") >= 300))
    assert inc.total_vectors(spark) == 600
    vecs = inc.vectors(spark)
    assert "pq_code" in vecs.columns
    assert vecs.filter(F.col("pq_code").isNull()).count() == 0

    oneshot = codec.encode(idx.assign(base, "embedding"), "embedding").cache()
    oneshot.count()
    for qi in (3, 450):
        q = np.random.default_rng(qi).standard_normal(16)
        want = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in ivfadc_search(
                idx, codec, oneshot, q, k=10, rerank=4,
                vec_col="embedding", id_col="vec_id",
            ).collect()
        ]
        got = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in inc.search_adc(spark, q, k=10, rerank=4).collect()
        ]
        assert got == want
    oneshot.unpersist()

    # reopen without index/codec objects: both reload from the path
    inc2 = IncrementalANN(f"{tmp_path}/pqann")
    q = np.random.default_rng(3).standard_normal(16)
    assert inc2.search_adc(spark, q, k=5).count() == 5
    assert inc2.codec(spark).to_bytes() == codec.to_bytes()

    # the ADC leg reads codes, not floats, and prunes to the probe dirs
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        inc2.search_adc(spark, q, k=5).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [centroid_id" in plan, plan
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "pq_code" in read_schema and "embedding" not in read_schema


def test_pq_sidecar_manifest_pins_codec(spark, tmp_path, fitted):
    from recsplit_spark.pipeline.pq import PQCodec

    idx, base = fitted
    codec = PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")
    inc = IncrementalANN(f"{tmp_path}/pqann", index=idx, codec=codec)
    inc.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding")

    other = PQCodec(m=4, ks=8, seed=44).fit(base, "embedding")
    bad = IncrementalANN(f"{tmp_path}/pqann", index=idx, codec=other)
    with pytest.raises(RuntimeError, match="manifest mismatch"):
        bad.append(base.filter(F.col("vec_id") >= 100), "vec_id", "embedding")

    # a plain store refuses a late codec (its generations have no codes)
    plain = IncrementalANN(f"{tmp_path}/plain", index=idx)
    plain.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding")
    late = IncrementalANN(f"{tmp_path}/plain", index=idx, codec=codec)
    with pytest.raises(RuntimeError, match="manifest mismatch"):
        late.append(base.filter(F.col("vec_id") >= 100), "vec_id", "embedding")
    with pytest.raises(RuntimeError, match="no PQ codec"):
        IncrementalANN(f"{tmp_path}/plain").search_adc(
            spark, np.zeros(16), k=3
        )


def test_pq_sidecar_append_dedup_carries_codes(spark, tmp_path, fitted):
    """Survivor generations from append_dedup carry codes too — the
    dedup-ingest and the ADC search surfaces compose."""
    from recsplit_spark.pipeline.pq import PQCodec

    idx, base = fitted
    emb = _clustered_emb(spark)
    codec = PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")
    store = IncrementalANN(f"{tmp_path}/sdpq", index=idx, codec=codec)
    kept0, _ = store.append_dedup(
        emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", threshold=0.9
    )
    assert sorted(r["vec_id"] for r in kept0.collect()) == [0, 2, 3]
    vecs = store.vectors(spark)
    assert "pq_code" in vecs.columns
    assert vecs.filter(F.col("pq_code").isNull()).count() == 0
    q = np.array(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    top = store.search_adc(spark, q, k=1, rerank=4).collect()[0]
    assert top["vec_id"] == 0


def test_compact_rebuckets_under_fresh_centroids(spark, tmp_path, fitted):
    """The planned re-key: refit + one-shot rebuild into a fresh path;
    the new store's search equals a one-shot assign under the new index,
    the PQ sidecar survives (codes are centroid-independent), and the
    old store is untouched."""
    from recsplit_spark.pipeline.pq import PQCodec

    idx, base = fitted
    codec = PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")
    old = IncrementalANN(f"{tmp_path}/old", index=idx, codec=codec)
    old.append(base.filter(F.col("vec_id") < 300), "vec_id", "embedding")
    old.append(base.filter(F.col("vec_id") >= 300))

    new, m = old.compact(spark, f"{tmp_path}/new")
    assert m["n"] == 600 and m["codec"]
    assert new.total_vectors(spark) == 600
    assert [g["gen"] for g in new.generations(spark)] == [0]
    # old store untouched and still searchable
    assert old.total_vectors(spark) == 600
    q = np.random.default_rng(5).standard_normal(16)
    assert old.search(spark, q, k=5).count() == 5

    new_idx = new.index(spark)
    oneshot = new_idx.assign(base, "embedding").cache()
    oneshot.count()
    for qi in (3, 450):
        qv = np.random.default_rng(qi).standard_normal(16)
        want = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in new_idx.search(oneshot, "embedding", qv, k=10).collect()
        ]
        got = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in new.search(spark, qv, k=10).collect()
        ]
        assert got == want
    oneshot.unpersist()
    # PQ sidecar re-pinned: byte identity of the codec and a working ADC
    assert new.codec(spark).to_bytes() == codec.to_bytes()
    assert new.search_adc(spark, q, k=5, rerank=4).count() == 5
    # reopen from the path alone
    assert IncrementalANN(f"{tmp_path}/new").search(spark, q, k=3).count() == 3


def test_compact_refuses_dirty_target_and_can_drop_codec(spark, tmp_path, fitted):
    from recsplit_spark.pipeline.pq import PQCodec

    idx, base = fitted
    codec = PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")
    old = IncrementalANN(f"{tmp_path}/old2", index=idx, codec=codec)
    old.append(base.filter(F.col("vec_id") < 100), "vec_id", "embedding")

    taken = IncrementalANN(f"{tmp_path}/taken", index=idx)
    taken.append(base.filter(F.col("vec_id") < 50), "vec_id", "embedding")
    with pytest.raises(RuntimeError, match="fresh path"):
        old.compact(spark, f"{tmp_path}/taken")

    # codec=None drops the sidecar; a custom fitted index is used as-is
    other = IVFIndex(n_centroids=4, nprobe=2, seed=77).fit(base, "embedding")
    new, m = old.compact(spark, f"{tmp_path}/plain_new", index=other,
                         codec=None)
    assert m["n"] == 100 and not m["codec"] and m["n_centroids"] == 4
    assert "pq_code" not in new.vectors(spark).columns
    with pytest.raises(RuntimeError, match="no PQ codec"):
        new.search_adc(spark, np.zeros(16), k=3)


def test_append_dedup_all_dup_batch_commits_nothing(spark, tmp_path, fitted):
    idx, _ = fitted
    emb = _clustered_emb(spark)
    store = IncrementalANN(f"{tmp_path}/sd", index=idx)
    store.append_dedup(emb.filter(F.col("vec_id") < 10), "vec_id",
                       "embedding", threshold=0.9)
    dups = emb.filter(F.col("vec_id") == 10)  # pure copy of kept cluster A
    kept, m = store.append_dedup(dups, threshold=0.9)
    assert m["gen"] is None and m["n_kept"] == 0 and kept.count() == 0
    assert store.total_vectors(spark) == 3


def test_residual_codec_store_roundtrip_and_compact(spark, tmp_path, fitted):
    """A ResidualPQ-pinned store: appends carry residual codes, a fresh
    handle lazy-loads the codec via magic dispatch (sha-checked against
    the reloaded index), search_adc matches the one-shot funnel, and
    compact(codec='keep') REFITS the residual codec against the new
    centroids instead of carrying stale index-coupled codebooks."""
    from recsplit_spark.pipeline.pq import ResidualPQ, ivfadc_search

    idx, base = fitted
    codec = ResidualPQ(idx, m=4, ks=8, seed=3).fit(base, "embedding")
    inc = IncrementalANN(f"{tmp_path}/rpq", index=idx, codec=codec)
    inc.append(base.filter(F.col("vec_id") < 300), "vec_id", "embedding")
    inc.append(base.filter(F.col("vec_id") >= 300))
    assert inc.total_vectors(spark) == 600

    oneshot = codec.encode(idx.assign(base, "embedding"), "embedding").cache()
    oneshot.count()
    q = np.random.default_rng(7).standard_normal(16)
    want = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in ivfadc_search(
            idx, codec, oneshot, q, k=10, rerank=4,
            vec_col="embedding", id_col="vec_id",
        ).collect()
    ]
    got = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in inc.search_adc(spark, q, k=10, rerank=4).collect()
    ]
    assert got == want
    oneshot.unpersist()

    # fresh handle: codec reloads from the blob as a ResidualPQ
    inc2 = IncrementalANN(f"{tmp_path}/rpq")
    reloaded = inc2.codec(spark)
    assert isinstance(reloaded, ResidualPQ)
    assert reloaded.to_bytes() == codec.to_bytes()
    assert inc2.search_adc(spark, q, k=5).count() == 5

    # compact with codec='keep': new centroids -> refit codec, pinned to
    # the NEW index (old blob would be refused under the new centroids)
    new, m = inc2.compact(spark, f"{tmp_path}/rpq2")
    assert m["n"] == 600 and m["codec"]
    new_codec = new.codec(spark)
    assert isinstance(new_codec, ResidualPQ)
    assert new_codec.to_bytes() != codec.to_bytes()
    assert (new_codec.m, new_codec.ks, new_codec.seed) == (4, 8, 3)
    assert new.search_adc(spark, q, k=5, rerank=4).count() == 5


def test_residual_codec_mismatched_index_refused(spark, tmp_path, fitted):
    from recsplit_spark.pipeline.pq import ResidualPQ

    idx, base = fitted
    other = IVFIndex(n_centroids=8, nprobe=3, seed=41).fit(base, "embedding")
    codec = ResidualPQ(other, m=4, ks=8, seed=3).fit(base, "embedding")
    bad = IncrementalANN(f"{tmp_path}/badrpq", index=idx, codec=codec)
    with pytest.raises(RuntimeError, match="different centroid set"):
        bad.append(base.limit(10), "vec_id", "embedding")

    # explicit mismatched residual codec at compact() is refused too:
    # the store's codec is pinned to idx, the compaction target is other
    idx_codec = ResidualPQ(idx, m=4, ks=8, seed=3).fit(base, "embedding")
    ok = IncrementalANN(f"{tmp_path}/okrpq", index=idx, codec=idx_codec)
    ok.append(base.limit(50), "vec_id", "embedding")
    with pytest.raises(RuntimeError, match="different centroid set"):
        ok.compact(spark, f"{tmp_path}/okrpq2", index=other, codec=idx_codec)


def test_search_adc_many_matches_per_query(spark, tmp_path, fitted):
    """Batched store serving == per-query search_adc(rerank=0), for both
    codec kinds, and the batched plan never reads the float column."""
    from recsplit_spark.pipeline.pq import (
        OPQCodec,
        PQCodec,
        ResidualPQ,
        SQ8Codec,
    )

    idx, base = fitted
    for name, codec in (
        ("raw", PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")),
        ("res", ResidualPQ(idx, m=4, ks=8, seed=3).fit(base, "embedding")),
        ("opq", OPQCodec(m=4, ks=8, seed=3).fit(base, "embedding")),
        ("sq8", SQ8Codec(seed=3).fit(base, "embedding")),
    ):
        inc = IncrementalANN(f"{tmp_path}/many_{name}", index=idx, codec=codec)
        inc.append(base, "vec_id", "embedding")
        queries = [
            np.random.default_rng(s).standard_normal(16) for s in (3, 7, 11)
        ]
        many = inc.search_adc_many(spark, queries, k=6).collect()
        by_q = {}
        for r in many:
            by_q.setdefault(r["qid"], []).append(
                (r["vec_id"], round(r["pq_score"], 5))
            )
        for qi, q in enumerate(queries):
            want = {
                (r["vec_id"], round(r["pq_score"], 5))
                for r in inc.search_adc(spark, q, k=6).collect()
            }
            got = set(by_q[qi])
            kth = min(s for _, s in want)
            assert sorted(s for _, s in got) == sorted(s for _, s in want)
            assert {v for v, s in got if s > kth} == {
                v for v, s in want if s > kth
            }, (name, qi)

        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            inc.search_adc_many(spark, queries, k=6).explain("formatted")
        plan = buf.getvalue()
        read_schema = plan.split("ReadSchema")[1].split("\n")[0]
        assert "pq_code" in read_schema and "embedding" not in read_schema

    # a plain store refuses batched ADC like it refuses single-query ADC
    plain = IncrementalANN(f"{tmp_path}/many_plain", index=idx)
    plain.append(base.limit(20), "vec_id", "embedding")
    with pytest.raises(RuntimeError, match="no PQ codec"):
        plain.search_adc_many(spark, [np.zeros(16)], k=3)


def test_bucket_stats_and_skew(spark, tmp_path, fitted):
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/skew", index=idx)
    inc.append(base.filter(F.col("vec_id") < 300), "vec_id", "embedding")
    inc.append(base.filter(F.col("vec_id") >= 300))
    stats = {
        int(r["centroid_id"]): int(r["n"])
        for r in inc.bucket_stats(spark).collect()
    }
    assert sum(stats.values()) == 600
    # counts match a direct per-bucket count over the committed table
    direct = {
        int(r["centroid_id"]): int(r["n"])
        for r in inc.vectors(spark)
        .groupBy("centroid_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert stats == direct
    s = inc.bucket_skew(spark)
    assert s["n_vectors"] == 600 and s["n_buckets"] == 8
    assert s["nonempty_buckets"] + s["empty_buckets"] == 8
    assert s["imbalance"] >= 1.0
    assert s["max_bucket"] == max(stats.values())


def test_streaming_ingest_into_codec_pinned_store(spark, tmp_path, fitted):
    """Streaming micro-batches into a ResidualPQ-pinned store: every
    generation carries codes (encoded inside the same append pass),
    batched ADC serving works over the streamed corpus, and replay after
    checkpoint loss commits nothing twice."""
    import pandas as pd

    from recsplit_spark.pipeline.pq import ResidualPQ
    from recsplit_spark.streaming import StreamingANNIngest

    idx, base = fitted
    codec = ResidualPQ(idx, m=4, ks=8, seed=3).fit(base, "embedding")
    src = tmp_path / "csrc"
    src.mkdir()
    pdf = base.toPandas()
    for i, (lo, hi) in enumerate([(0, 300), (300, 600)]):
        pd.DataFrame(pdf[(pdf.vec_id >= lo) & (pdf.vec_id < hi)]).to_parquet(
            src / f"part-{i}.parquet", index=False
        )

    def stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    store = IncrementalANN(f"{tmp_path}/cann", index=idx, codec=codec)
    q = StreamingANNIngest(store, "vec_id", "embedding").start(
        stream(), checkpoint_dir=f"{tmp_path}/cckpt"
    )
    q.awaitTermination(180)
    assert store.total_vectors(spark) == 600
    vecs = store.vectors(spark)
    assert vecs.filter(F.col("pq_code").isNull()).count() == 0

    qv = np.random.default_rng(11).standard_normal(16)
    adc = store.search_adc_many(spark, [qv], k=5, rerank=4).collect()
    assert len(adc) == 5
    # replay from scratch: no double commits, serving unchanged
    ing2 = StreamingANNIngest(
        IncrementalANN(f"{tmp_path}/cann"), "vec_id", "embedding"
    )
    q2 = ing2.start(stream(), checkpoint_dir=f"{tmp_path}/cckpt2")
    q2.awaitTermination(180)
    assert all(m["skipped_replay"] for m in ing2.metrics)
    assert IncrementalANN(f"{tmp_path}/cann").total_vectors(spark) == 600


def test_delete_tombstones_and_compact_drops(spark, tmp_path, fitted):
    """Tombstone deletion: search/serving stop seeing deleted ids
    immediately (vectors() anti-join), re-deletes and unknown ids are
    harmless, and compact() physically drops the tombstoned rows into a
    clean new store."""
    from recsplit_spark.pipeline.pq import PQCodec

    idx, base = fitted
    codec = PQCodec(m=4, ks=8, seed=3).fit(base, "embedding")
    inc = IncrementalANN(f"{tmp_path}/del", index=idx, codec=codec)
    inc.append(base, "vec_id", "embedding")

    # pick a query whose exact top-1 is itself, then delete it
    q = np.array(
        base.filter(F.col("vec_id") == 42).first()["embedding"],
        dtype=np.float64,
    )
    assert inc.search(spark, q, k=1).first()["vec_id"] == 42
    m = inc.delete(spark, [42, 43, 999_999])  # 999999 never existed
    assert m["n"] == 3 and m["gen"] == 0
    assert inc.total_tombstoned(spark) == 3
    assert inc.vectors(spark).count() == 598
    got = {r["vec_id"] for r in inc.search(spark, q, k=5).collect()}
    assert 42 not in got and 43 not in got
    adc = {r["vec_id"] for r in inc.search_adc(spark, q, k=5).collect()}
    assert 42 not in adc and 43 not in adc

    # re-delete + DataFrame form, set semantics
    m2 = inc.delete(spark, base.filter(F.col("vec_id") < 2).select("vec_id"))
    assert m2["n"] == 2
    inc.delete(spark, [42])  # again: harmless
    assert inc.total_tombstoned(spark) == 5
    assert inc.vectors(spark).count() == 596

    # fresh handle applies tombstones without any prior manifest call
    fresh = IncrementalANN(f"{tmp_path}/del")
    assert fresh.vectors(spark).count() == 596

    # compact: physical drop, clean tombstone slate, codec carried
    new, mm = inc.compact(spark, f"{tmp_path}/del2")
    assert mm["n"] == 596
    assert new.total_vectors(spark) == 596
    assert new.total_tombstoned(spark) == 0
    got2 = {r["vec_id"] for r in new.search_adc(spark, q, k=5).collect()}
    assert 42 not in got2


def test_delete_refuses_type_mismatched_ids(spark, tmp_path, fitted):
    """A tombstone table of the wrong id type would poison every later
    read far from the cause — delete() aligns castable ids and refuses
    malformed ones at write time."""
    idx, base = fitted
    inc = IncrementalANN(f"{tmp_path}/tguard", index=idx)
    inc.append(base.limit(50), "vec_id", "embedding")
    with pytest.raises(ValueError, match="do not cast"):
        inc.delete(spark, ["doc-1", "doc-2"])
    # numeric strings cast cleanly to the store's long ids
    m = inc.delete(spark, ["7", "9"])
    assert m["n"] == 2
    assert inc.vectors(spark).count() == 48
    # delete on a store with no committed vectors is a no-op
    empty = IncrementalANN(f"{tmp_path}/tguard2", index=idx)
    empty.append(base.limit(0), "vec_id", "embedding")
    assert empty.delete(spark, [1])["n"] == 0
