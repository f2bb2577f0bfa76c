"""Streaming incremental sketches: state after draining a file stream must
equal the batch build over the same rows (monoid order-independence)."""

import numpy as np
import pytest

from recsplit_spark.data import sequence_batch
from recsplit_spark.session import ship_package
from recsplit_spark.sketches import KLL, HyperLogLog
from recsplit_spark.streaming import StreamingSketch


@pytest.fixture(scope="module")
def staged_dir(spark, tmp_path_factory):
    """Three parquet files of deterministic sequence rows (30k total)."""
    ship_package(spark)
    root = tmp_path_factory.mktemp("stream_src")
    import pandas as pd

    for i, (lo, hi) in enumerate([(0, 10_000), (10_000, 20_000), (20_000, 30_000)]):
        doc_ids, tokens, n_tok, src = sequence_batch(lo, hi)
        pd.DataFrame(
            {"doc_id": doc_ids, "n_tok": n_tok.astype(np.int32), "source": src}
        ).to_parquet(root / f"part-{i}.parquet", index=False)
    return str(root)


def _read_stream(spark, path):
    return (
        spark.readStream.schema("doc_id string, n_tok int, source string")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(path)
    )


def test_streaming_hll_equals_batch(spark, staged_dir):
    agg = StreamingSketch(HyperLogLog(p=12), "doc_id")
    q = agg.start(_read_stream(spark, staged_dir))
    q.awaitTermination(120)
    batch_state = HyperLogLog(p=12).build(spark.read.parquet(staged_dir), "doc_id")
    assert agg.sketch.to_bytes(agg.state) == agg.sketch.to_bytes(batch_state)
    assert abs(agg.estimate() - 30_000) <= 3 * HyperLogLog(p=12).relative_error * 30_000


def test_streaming_kll_quantile_bound(spark, staged_dir):
    kll = KLL(k=200)
    agg = StreamingSketch(kll, "n_tok")
    q = agg.start(_read_stream(spark, staged_dir))
    q.awaitTermination(120)
    vals = np.sort(
        spark.read.parquet(staged_dir).select("n_tok").toPandas()["n_tok"].to_numpy()
    )
    for p in (0.1, 0.5, 0.9):
        est = kll.quantile(agg.state, p)
        rank = np.searchsorted(vals, est, side="right") / len(vals)
        assert abs(rank - p) <= kll.epsilon + 0.01


def test_streaming_resume_skips_replayed(spark, staged_dir, tmp_path):
    state_path = str(tmp_path / "hll_state.bin")
    ckpt = str(tmp_path / "ckpt")
    agg = StreamingSketch(HyperLogLog(p=12), "doc_id", state_path=state_path)
    # the sidecar's replay guard is only sound under ONE checkpoint
    # lineage: state_path without checkpoint_dir is refused, and a
    # resume under a DIFFERENT checkpoint is refused (its batch ids
    # restart from 0 — the guard would silently skip all new data)
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        agg.start(_read_stream(spark, staged_dir))
    q = agg.start(_read_stream(spark, staged_dir), checkpoint_dir=ckpt)
    q.awaitTermination(120)
    est1 = agg.estimate()
    # new aggregator from the persisted state: replays of already-folded
    # batch ids must be no-ops, so the estimate is unchanged
    agg2 = StreamingSketch(HyperLogLog(p=12), "doc_id", state_path=state_path)
    assert agg2.last_batch_id == agg.last_batch_id
    with pytest.raises(ValueError, match="was built under"):
        agg2.start(
            _read_stream(spark, staged_dir),
            checkpoint_dir=str(tmp_path / "other_ckpt"),
        )
    import pandas as pd

    replay_df = spark.read.parquet(staged_dir)
    agg2.foreach_batch(replay_df, batch_id=0)  # stale id -> skipped
    assert agg2.estimate() == est1
    agg2.foreach_batch(replay_df.limit(0), batch_id=agg2.last_batch_id + 1)
    assert agg2.estimate() == est1  # empty batch merges as identity


def test_stateful_sketch_by_key(spark, staged_dir, tmp_path):
    """applyInPandasWithState per-key HLL: final state per key must match a
    batch per-group build over the same rows (exact state equality through
    the estimate, since updates are deterministic)."""
    import pyspark.sql.functions as F

    from recsplit_spark.streaming import stateful_sketch_by_key

    hll = HyperLogLog(p=12)
    stream = _read_stream(spark, staged_dir)
    out = stateful_sketch_by_key(stream, hll, "doc_id", "source")
    q = (
        out.writeStream.format("memory")
        .queryName("per_key_hll")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(
        "SELECT source, estimate FROM per_key_hll a WHERE n_total = "
        "(SELECT max(n_total) FROM per_key_hll b WHERE b.source = a.source)"
    ).toPandas()
    got = dict(zip(pdf["source"], pdf["estimate"]))
    batch = {
        r["source"]: r["estimate"]
        for r in hll.aggregate(
            spark.read.parquet(staged_dir), "doc_id", ["source"]
        ).collect()
    }
    assert set(got) == set(batch)
    for k in batch:
        assert got[k] == batch[k], (k, got[k], batch[k])


@pytest.fixture(scope="module")
def timed_dir(spark, tmp_path_factory):
    """Three parquet files with ascending event times spanning 3 ten-minute
    windows (file i = window i), so the watermark closes earlier windows as
    later files stream in."""
    root = tmp_path_factory.mktemp("timed_src")
    import pandas as pd

    base = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(3):
        doc_ids, _tokens, n_tok, _src = sequence_batch(i * 5000, (i + 1) * 5000)
        ts = base + pd.Timedelta(minutes=10 * i) + pd.to_timedelta(
            np.arange(5000) % 540, unit="s"
        )
        pd.DataFrame(
            {"doc_id": doc_ids, "ts": ts.astype("datetime64[us]")}
        ).to_parquet(root / f"part-{i}.parquet", index=False)
    return str(root)


def test_windowed_sketch_watermark_finalize(spark, timed_dir, tmp_path):
    """Per-window HLL estimates equal batch per-window builds; windows whose
    end the watermark passed are finalized and evicted."""
    import pyspark.sql.functions as F

    from recsplit_spark.streaming import windowed_sketch

    hll = HyperLogLog(p=12)
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(timed_dir)
    )
    out = windowed_sketch(stream, hll, "doc_id", "ts", "10 minutes", "1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("win_hll")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(
        "SELECT window_start, estimate, n_total, final FROM win_hll"
    ).toPandas()
    # last emission per window
    last = pdf.sort_values("n_total").groupby("window_start").last()
    batch = {
        r["w"]["start"]: r["estimate"]
        for r in hll.aggregate(
            spark.read.parquet(timed_dir).select(
                F.window("ts", "10 minutes").alias("w"), "doc_id"
            ).select(F.col("w").alias("w"), "doc_id").withColumn(
                "wkey", F.col("w.start").cast("string")
            ),
            "doc_id",
            ["wkey"],
        ).join(
            spark.read.parquet(timed_dir)
            .select(F.window("ts", "10 minutes").alias("w"))
            .distinct()
            .withColumn("wkey", F.col("w.start").cast("string")),
            "wkey",
        ).collect()
    }
    assert len(last) == 3
    for wstart, row in last.iterrows():
        assert row["n_total"] == 5000
        assert row["estimate"] == batch[wstart.to_pydatetime()], wstart
    # earlier windows got finalized by the advancing watermark
    finals = set(pdf[pdf["final"]]["window_start"])
    assert len(finals) >= 1  # at least window 0 closed before the drain ended


def test_streaming_theta_equals_batch_exactly(spark, staged_dir):
    """Theta's bottom-k state is exactly order-independent, so the drained
    stream state must be byte-identical to the batch build."""
    from recsplit_spark.sketches import ThetaSketch

    sk = ThetaSketch(k=512)
    agg = StreamingSketch(sk, "doc_id")
    q = agg.start(_read_stream(spark, staged_dir))
    q.awaitTermination(120)
    batch_state = sk.build(spark.read.parquet(staged_dir), "doc_id")
    assert sk.to_bytes(agg.state) == sk.to_bytes(batch_state)
    assert abs(agg.estimate() - 30_000) <= 4 * sk.relative_error * 30_000


def test_streaming_mg_bound_holds(spark, staged_dir):
    """MG retained counters are merge-order-dependent, but the carried
    certificate must hold after a streamed fold: exact - est <= dec."""
    from recsplit_spark.sketches import MisraGries

    mg = MisraGries(k=16)
    agg = StreamingSketch(mg, "source")
    q = agg.start(_read_stream(spark, staged_dir))
    q.awaitTermination(120)
    st = agg.state
    assert st.n == 30_000
    assert mg.error_bound(st) <= st.n // (mg.k + 1) + 1
    exact = (
        spark.read.parquet(staged_dir).groupBy("source").count().collect()
    )
    for r in exact:
        diff = r["count"] - mg.estimate_count(st, r["source"])
        assert 0 <= diff <= mg.error_bound(st), r["source"]


def test_windowed_sketch_theta(spark, timed_dir, tmp_path):
    """windowed_sketch is sketch-generic: per-window theta estimates equal
    the exact per-window distinct counts (exact mode: k > window size)."""
    from recsplit_spark.sketches import ThetaSketch
    from recsplit_spark.streaming import windowed_sketch

    sk = ThetaSketch(k=8192)  # > 5000 per window -> exact
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(timed_dir)
    )
    out = windowed_sketch(stream, sk, "doc_id", "ts", "10 minutes", "1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("win_theta")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_win_theta"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(
        "SELECT window_start, estimate, n_total FROM win_theta"
    ).toPandas()
    last = pdf.sort_values("n_total").groupby("window_start").last()
    assert len(last) == 3
    for _wstart, row in last.iterrows():
        assert row["n_total"] == 5000
        assert row["estimate"] == 5000.0  # distinct doc_ids, exact regime


# -- n-gram feeds over a token stream (round 4) ------------------------------


@pytest.fixture(scope="module")
def token_staged_dir(spark, tmp_path_factory):
    """Three parquet files carrying the tokens:array<int32> payload."""
    ship_package(spark)
    root = tmp_path_factory.mktemp("stream_tok_src")
    import pandas as pd

    for i, (lo, hi) in enumerate([(0, 4_000), (4_000, 8_000), (8_000, 12_000)]):
        doc_ids, tokens, n_tok, src = sequence_batch(lo, hi)
        pd.DataFrame(
            {
                "doc_id": doc_ids,
                "tokens": [t.tolist() for t in tokens],
                "source": src,
            }
        ).to_parquet(root / f"part-{i}.parquet", index=False)
    return str(root)


def _read_token_stream(spark, path):
    return (
        spark.readStream.schema(
            "doc_id string, tokens array<long>, source string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_streaming_ngram_hll_equals_batch(spark, token_staged_dir):
    """Incremental trigram-cardinality state over a token stream is
    byte-identical to the batch ngram build — the stream never explodes
    token arrays into rows."""
    agg = StreamingSketch(HyperLogLog(p=12), "tokens", ngram=3)
    q = agg.start(_read_token_stream(spark, token_staged_dir))
    q.awaitTermination(120)
    batch_state = HyperLogLog(p=12).build(
        spark.read.parquet(token_staged_dir), "tokens", ngram=3
    )
    assert agg.sketch.to_bytes(agg.state) == agg.sketch.to_bytes(batch_state)
    assert agg.estimate() > 100_000


def test_streaming_ngram_rejects_value_sketch(spark):
    with pytest.raises(ValueError, match="cannot fold n-gram window hashes"):
        StreamingSketch(KLL(), "tokens", ngram=3)


def test_stateful_by_key_ngram_matches_batch_aggregate(
    spark, token_staged_dir, tmp_path
):
    """Live per-source distinct-trigram tracking: after draining the
    stream, every source's estimate equals the batch per-key ngram
    aggregate (same states by monoid order-independence)."""
    from recsplit_spark.streaming import stateful_sketch_by_key

    sk = HyperLogLog(p=12)
    out = stateful_sketch_by_key(
        _read_token_stream(spark, token_staged_dir), sk, "tokens", "source",
        ngram=3,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bykey_ngram")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_bykey_ngram"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql(
            "SELECT source, estimate, n_total FROM bykey_ngram"
        )
        .toPandas()
        .sort_values("n_total")
        .groupby("source")
        .last()
    )
    batch = spark.read.parquet(token_staged_dir)
    want = (
        sk.aggregate(batch, "tokens", ("source",), ngram=3)
        .toPandas()
        .set_index("source")
    )
    assert len(got) == 4
    for srcname, row in got.iterrows():
        assert row["estimate"] == pytest.approx(want.loc[srcname, "estimate"])


def test_streaming_mphf_ingest_survives_checkpoint_loss(spark, staged_dir, tmp_path):
    """Stream ingest assigns stable [0, n) ids one generation per
    micro-batch; replay safety rides the structure's own lineage, so even
    LOSING the streaming checkpoint (source re-delivers from batch 0)
    cannot double-assign ids."""
    from pyspark.sql import functions as F

    from recsplit_spark.incremental_mphf import IncrementalMPHF
    from recsplit_spark.streaming import StreamingMPHFIngest

    inc = IncrementalMPHF(f"{tmp_path}/ids")
    ingest = StreamingMPHFIngest(inc, "doc_id")
    q = ingest.start(_read_stream(spark, staged_dir),
                     checkpoint_dir=f"{tmp_path}/ckpt1")
    q.awaitTermination(180)
    assert len(ingest.metrics) == 3
    assert sorted(m["n"] for m in ingest.metrics) == [10_000] * 3
    assert inc.total_keys(spark) == 30_000

    full = spark.read.parquet(staged_dir)
    out = inc.route(full, "doc_id")
    agg = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("mphf_index").alias("d"),
        F.min("mphf_index").alias("lo"),
        F.max("mphf_index").alias("hi"),
        F.sum(F.col("mphf_index").isNull().cast("int")).alias("nulls"),
    ).collect()[0]
    assert (agg["n"], agg["d"], agg["lo"], agg["hi"], agg["nulls"]) == (
        30_000, 30_000, 0, 29_999, 0,
    )
    id_sum_before = out.agg(F.sum("mphf_index")).collect()[0][0]

    # checkpoint loss: a FRESH checkpoint dir re-delivers batches 0..2
    ingest2 = StreamingMPHFIngest(IncrementalMPHF(f"{tmp_path}/ids"), "doc_id")
    q2 = ingest2.start(_read_stream(spark, staged_dir),
                       checkpoint_dir=f"{tmp_path}/ckpt2")
    q2.awaitTermination(180)
    assert ingest2.metrics and all(
        m.get("skipped_replay") for m in ingest2.metrics
    )
    inc3 = IncrementalMPHF(f"{tmp_path}/ids")
    assert inc3.total_keys(spark) == 30_000
    id_sum_after = inc3.route(full, "doc_id").agg(
        F.sum("mphf_index")
    ).collect()[0][0]
    assert id_sum_after == id_sum_before


def test_streaming_dedup_ingest_exactly_once_output(spark, tmp_path):
    """Streaming near-dedup: survivors of each micro-batch land in
    out/batch=<id>; replay after checkpoint loss recomputes the SAME kept
    sets from the dedup state and overwrites the same paths — the output
    corpus never gains a duplicate or loses a survivor."""
    import pandas as pd
    from pyspark.sql import functions as F

    from recsplit_spark.pipeline.incremental_dedup import IncrementalDedup
    from recsplit_spark.streaming import StreamingDedupIngest

    def word(i):
        return f"t{i % 83}u{i % 79}"

    def text(cluster=None, uid=0):
        if cluster is None:
            return " ".join(word(uid * 991 + 17 * j) for j in range(60))
        return " ".join(word(cluster * 127 + 7 * j) for j in range(120)) + (
            f" tail{uid}" if uid else ""
        )

    src = tmp_path / "src"
    src.mkdir()
    # file 0: cluster 1 twice + 2 uniques; file 1: cluster-1 copy (dups
    # vs state) + new cluster 2 + unique; file 2: copies of both kept
    # reps + unique
    files = [
        [(0, text(1)), (1, text(1, 1)), (2, text(uid=2)), (3, text(uid=3))],
        [(10, text(1, 2)), (11, text(2)), (12, text(2, 3)), (13, text(uid=13))],
        [(20, text(1, 4)), (21, text(2, 5)), (22, text(uid=22))],
    ]
    for i, rows in enumerate(files):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            src / f"part-{i}.parquet", index=False
        )

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    state = f"{tmp_path}/dd"
    out = f"{tmp_path}/clean"
    cfg = dict(threshold=0.8, num_hashes=64, bands=32, shingle=5)
    ing = StreamingDedupIngest(
        IncrementalDedup(state, **cfg), "doc_id", "text", out
    )
    q = ing.start(stream(), checkpoint_dir=f"{tmp_path}/ckpt1")
    q.awaitTermination(180)
    assert len(ing.metrics) == 3 and not any(
        m["skipped_replay"] for m in ing.metrics
    )
    want = [0, 2, 3, 11, 13, 22]
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert got == want

    # checkpoint loss: the source replays every batch; output is unchanged
    ing2 = StreamingDedupIngest(
        IncrementalDedup(state, **cfg), "doc_id", "text", out
    )
    q2 = ing2.start(stream(), checkpoint_dir=f"{tmp_path}/ckpt2")
    q2.awaitTermination(180)
    assert ing2.metrics and all(m["skipped_replay"] for m in ing2.metrics)
    again = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert again == want
    assert IncrementalDedup(state, **cfg).total_kept(spark) == len(want)


def test_windowed_sketch_nonutc_session_timezone(spark, timed_dir, tmp_path):
    """Event-time timeouts must survive a non-UTC session timezone: the
    group key reaches the worker as a tz-naive SESSION-LOCAL timestamp,
    and a naive .timestamp() assumes UTC — pre-fix, a west-of-UTC
    session shifted the timeout 8h early and the engine killed the
    query with INVALID_TIMEOUT_TIMESTAMP once the watermark advanced."""
    from recsplit_spark.streaming import windowed_sketch

    tz_key = "spark.sql.session.timeZone"
    old_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "America/Los_Angeles")
    try:
        hll = HyperLogLog(p=12)
        stream = (
            spark.readStream.schema("doc_id string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(timed_dir)
        )
        out = windowed_sketch(
            stream, hll, "doc_id", "ts", "10 minutes", "1 minute"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("win_hll_tz")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tz"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None  # pre-fix: INVALID_TIMEOUT_TIMESTAMP
        pdf = spark.sql(
            "SELECT window_start, final FROM win_hll_tz"
        ).toPandas()
        # the watermark passed at least the first window's end, so its
        # state timed out and emitted the final row
        assert bool(pdf["final"].any())
    finally:
        spark.conf.set(tz_key, old_tz)


def test_stateful_by_key_bool_keys_python_str_forms(spark, tmp_path):
    """Streaming per-key output must carry PYTHON-str key forms
    ('True'/'False'), matching every batch per-key surface
    (multi._stage1_by_key / base partials use str(kt)); a Spark CAST
    would emit 'true'/'false' and zero-match any join against batch
    state tables (the bool-key regression class CLAUDE.md pins)."""
    import pandas as pd

    from recsplit_spark.streaming import stateful_sketch_by_key

    src_dir = tmp_path / "bool_src"
    src_dir.mkdir()
    pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(200)],
            "flag": [i % 3 == 0 for i in range(200)],
        }
    ).to_parquet(src_dir / "part-0.parquet", index=False)

    hll = HyperLogLog(p=12)
    stream = (
        spark.readStream.schema("doc_id string, flag boolean")
        .parquet(str(src_dir))
    )
    out = stateful_sketch_by_key(stream, hll, "doc_id", "flag")
    q = (
        out.writeStream.format("memory")
        .queryName("per_key_bool")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_bool"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pdf = spark.sql("SELECT flag, estimate FROM per_key_bool").toPandas()
    got = dict(zip(pdf["flag"], pdf["estimate"]))
    batch = {
        r["flag"]: r["estimate"]
        for r in hll.aggregate(
            spark.read.parquet(str(src_dir)), "doc_id", ["flag"]
        ).collect()
    }
    assert set(batch) == {"True", "False"}  # batch contract: str() forms
    assert got == batch  # streaming matches key-for-key, value-for-value
