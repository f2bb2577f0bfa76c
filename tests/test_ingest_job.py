"""End-to-end test of the composed ingest job (scripts/ingest_job.py).

Drives main() in-process (same argv surface spark-submit sees) over two
synthetic batches through the FULL composition — PII scrub, learned
quality gate, incremental near-dedup, stable id assignment, SQ8-coded
ANN append, nightly profile fold, BPE-tokenized bin packing — then
replays batch 2 and asserts the replay is a stage-level no-op with a
byte-identical committed output slot. This is the deploy shape of the
north rule (spark-submit --py-files); everything the job composes is
unit-tested elsewhere, so this test pins only the COMPOSITION contract:
stage ordering, replay markers, id-universe construction.
"""

import hashlib
import importlib.util
import json
import os
import sys

import pytest

_WORDS = [
    "orbit", "lattice", "quartz", "ember", "signal", "harbor", "cinder",
    "meadow", "tensor", "anchor", "prism", "velvet", "canyon", "borealis",
    "tandem", "mosaic", "zephyr", "cobalt", "garnet", "juniper",
]


def _doc_text(i: int) -> str:
    """Deterministic pseudo-document; length and punctuation vary with i
    so every with_quality_stats feature is non-constant over a batch."""
    n = 12 + (i * 7) % 40
    words = [_WORDS[(i * 13 + j * 5) % len(_WORDS)] for j in range(n)]
    if i % 3 == 0:
        words[0] = words[0].upper()
    sep = ". " if i % 4 == 0 else " "
    return sep.join(words) + ("." if i % 2 == 0 else "")


def _emb(i: int) -> list:
    return [float(((i * 31 + j * 17) % 97) - 48) / 48.0 for j in range(8)]


def _rows(ids):
    return [
        (int(i), _doc_text(int(i)), "src%d" % (i % 3), _emb(int(i)))
        for i in ids
    ]


def _load_job():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ingest_job_under_test", os.path.join(here, "scripts", "ingest_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_job(monkeypatch, capsys, argv):
    job = _load_job()
    monkeypatch.setattr(sys, "argv", ["ingest_job.py"] + argv)
    rc = job.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def _slot_md5(slot: str) -> list:
    sums = []
    for name in sorted(os.listdir(slot)):
        if name.endswith(".parquet"):
            with open(os.path.join(slot, name), "rb") as f:
                sums.append((name, hashlib.md5(f.read()).hexdigest()))
    return sums


@pytest.fixture(scope="module")
def ingest_lake(spark, tmp_path_factory):
    """Two batches + the pre-trained artifacts the job consumes."""
    root = tmp_path_factory.mktemp("ingest_job")
    schema = "doc_id long, text string, source string, embedding array<float>"

    # batch 2 repeats four batch-1 texts under NEW ids -> cross-batch
    # near-dup matches against persisted state (exact copies: jaccard 1)
    b1_ids = list(range(100, 180))
    b2_ids = list(range(300, 370))
    b1 = spark.createDataFrame(_rows(b1_ids), schema)
    b2_rows = _rows(b2_ids) + [
        (int(500 + k), _doc_text(100 + k), "src0", _emb(500 + k))
        for k in range(4)
    ]
    b2 = spark.createDataFrame(b2_rows, schema)
    b1.coalesce(1).write.parquet(str(root / "batch1"))
    b2.coalesce(1).write.parquet(str(root / "batch2"))

    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.bpe import BPETokenizer
    from recsplit_spark.pipeline.classifier import LogisticQualityModel
    from recsplit_spark.pipeline.text import with_quality_stats

    tok = BPETokenizer.train(b1, "text", vocab_size=280)
    (root / "bpe.blob").write_bytes(tok.to_bytes())

    import pyspark.sql.functions as F

    feats = with_quality_stats(b1, "text").withColumn(
        "label", (F.length("text") > 150).cast("int")
    )
    model = LogisticQualityModel.fit(
        feats, ["n_tokens", "avg_token_len", "punct_ratio"], "label",
        max_iter=6,
    )
    (root / "quality.blob").write_bytes(model.to_bytes())

    idx = IVFIndex(n_centroids=4).fit(b1, "embedding")
    idx.save(spark, str(root / "ivf_index"))
    return root


def _argv(root, batch, batch_id):
    return [
        "--input", str(root / batch),
        "--root", str(root / "lake"),
        "--out", str(root / "clean"),
        "--id-col", "doc_id", "--text-col", "text", "--mode", "text",
        "--batch-id", str(batch_id),
        "--scrub-pii",
        "--quality-model", str(root / "quality.blob"),
        "--quality-threshold", "0.2",
        "--vec-col", "embedding",
        "--ann-index", str(root / "ivf_index"),
        "--pq", "sq8",
        "--profile-spec", "docs=hll:doc_id",
        "--profile-keys", "source",
        "--pack-capacity", "256",
        "--tokenizer", str(root / "bpe.blob"),
        "--packed-out", str(root / "packed"),
    ]


def test_ingest_job_two_batches_then_byte_identical_replay(
    spark, ingest_lake, monkeypatch, capsys
):
    root = ingest_lake

    rc1, m1 = _run_job(monkeypatch, capsys, _argv(root, "batch1", 1))
    assert rc1 == 0
    assert m1["quality"]["in"] == 80
    n1 = m1["dedup"]["n_kept"]
    assert 0 < n1 <= 80 - m1["quality"]["dropped"]
    assert m1["ids"]["n"] == n1 and m1["ids"]["offset"] == 0
    assert m1["ann"]["n"] == n1
    assert m1["profile"]["rows"] == n1
    assert m1["pack"]["n_bins"] > 0
    assert m1["rows_out"] == n1

    rc2, m2 = _run_job(monkeypatch, capsys, _argv(root, "batch2", 2))
    assert rc2 == 0
    # the four replanted batch-1 texts must match persisted STATE
    # (their survivors among the quality gate; at least one survives)
    assert m2["dedup"]["n_matched_old"] >= 1
    n2 = m2["dedup"]["n_kept"]
    assert m2["ids"]["offset"] == n1  # stable continuation, no renumber
    assert m2["total_ids"] == n1 + n2

    # composed id universe: a bijection onto [0, n1+n2)
    import pyspark.sql.functions as F

    clean = (
        spark.read.option("basePath", str(root / "clean"))
        .parquet(str(root / "clean"))
    )
    agg = clean.agg(
        F.count("*").alias("n"),
        F.countDistinct("mphf_index").alias("d"),
        F.min("mphf_index").alias("lo"),
        F.max("mphf_index").alias("hi"),
    ).collect()[0]
    assert (agg.n, agg.d, agg.lo, agg.hi) == (
        n1 + n2, n1 + n2, 0, n1 + n2 - 1
    )

    # replay of batch 2: every stateful stage skips via its lineage
    # marker and the committed slot is preserved byte-for-byte
    slot = str(root / "clean" / "batch=2")
    before = _slot_md5(slot)
    rc3, m3 = _run_job(monkeypatch, capsys, _argv(root, "batch2", 2))
    assert rc3 == 0
    assert m3["dedup"]["skipped_replay"] is True
    assert m3["ids"]["skipped_replay"] is True
    assert m3["ann"]["skipped_replay"] is True
    assert m3["profile"]["new_files"] == 0
    assert m3["total_ids"] == n1 + n2
    assert _slot_md5(slot) == before


def test_ingest_job_preflight_refuses_before_any_state_commit(
    spark, ingest_lake, monkeypatch, capsys, tmp_path
):
    """Bad flag combinations must fail BEFORE the stateful appends —
    a stage-3+ SystemExit leaves dedup/ids committed and turns the
    retry into an empty-output run (reviewed failure mode)."""
    root = ingest_lake
    lake = tmp_path / "lake"

    def run(extra):
        argv = [
            "--input", str(root / "batch1"),
            "--root", str(lake),
            "--out", str(tmp_path / "clean"),
            "--id-col", "doc_id", "--text-col", "text",
        ] + extra
        job = _load_job()
        monkeypatch.setattr(sys, "argv", ["ingest_job.py"] + argv)
        with pytest.raises(SystemExit):
            job.main()
        # the defining property: nothing stateful was created
        assert not (lake / "dedup").exists()
        assert not (lake / "ids").exists()

    # text-mode packing without a tokenizer blob
    run(["--mode", "text", "--pack-capacity", "256"])
    # tokens-mode --tokenizer is refused, not silently dropped
    run(["--mode", "tokens", "--pack-capacity", "256",
         "--tokenizer", str(root / "bpe.blob")])
    # unreadable quality-model blob fails before the input scan
    run(["--mode", "text", "--quality-model", str(root / "nope.blob")])
    # malformed --profile-spec
    run(["--profile-spec", "docs=hll"])
    # --pq without --vec-col would be silently ignored
    run(["--pq", "sq8"])
    # FIRST ANN run without --ann-index (needs the session: FS probe)
    run(["--vec-col", "embedding"])
