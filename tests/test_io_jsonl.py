"""JSONL ingestion (io.read_jsonl / read_sequences_jsonl / write_jsonl):
explicit-schema raw-dump reads with the three malformed-line policies,
token-array round-trip fidelity, and transparent gzip shards."""

import gzip

import pytest
from pyspark.sql import functions as F

from recsplit_spark.io import (
    SEQUENCES_FIELDS,
    read_jsonl,
    read_sequences_jsonl,
    write_jsonl,
)

DOC_FIELDS = {"doc_id": "bigint", "lang": "string", "n": "int"}


def _write_lines(tmp_path, lines, name="part-0.jsonl"):
    d = tmp_path / "dump"
    d.mkdir(exist_ok=True)
    (d / name).write_text("\n".join(lines) + "\n")
    return str(d)


def test_sequences_jsonl_roundtrip_exact(spark, tmp_path):
    """write_jsonl -> read_sequences_jsonl is value-identical to the
    generator, INCLUDING int32 token arrays (explicit schema: JSON
    integers must not widen to bigint)."""
    from recsplit_spark.data import sequences

    n = 2000
    path = str(tmp_path / "seq_jsonl")
    write_jsonl(sequences(spark, n, partitions=4), path)
    back = read_sequences_jsonl(spark, path)
    assert {f.name: f.dataType.simpleString() for f in back.schema.fields} \
        == SEQUENCES_FIELDS
    regen = sequences(spark, n, partitions=3).select(
        "doc_id",
        F.col("tokens").alias("tokens2"),
        F.col("n_tok").alias("n_tok2"),
        F.col("source").alias("source2"),
    )
    row = back.join(regen, "doc_id").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                (F.col("tokens") == F.col("tokens2"))
                & (F.col("n_tok") == F.col("n_tok2"))
                & (F.col("source") == F.col("source2")),
                0,
            ).otherwise(1)
        ).alias("bad"),
    ).collect()[0]
    assert (row["n"], row["bad"]) == (n, 0)


def test_on_bad_policies(spark, tmp_path):
    good = [
        '{"doc_id": 1, "lang": "en", "n": 10}',
        '{"doc_id": 2, "lang": "de", "n": 20}',
    ]
    bad = ["{not json at all", '{"doc_id": "NOT_A_NUMBER", "lang": 3]}']
    path = _write_lines(tmp_path, good + bad)

    dropped = read_jsonl(spark, path, DOC_FIELDS, on_bad="drop")
    assert sorted(
        (r["doc_id"], r["lang"], r["n"]) for r in dropped.collect()
    ) == [(1, "en", 10), (2, "de", 20)]

    kept = read_jsonl(spark, path, DOC_FIELDS, on_bad="keep")
    rows = kept.collect()  # materialized: corrupt_record-only plans bite
    assert len(rows) == 4
    corrupt = [r for r in rows if r["corrupt_record"] is not None]
    assert sorted(r["corrupt_record"] for r in corrupt) == sorted(bad)
    assert all(r["doc_id"] is None for r in corrupt)

    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        read_jsonl(spark, path, DOC_FIELDS, on_bad="error").count()

    with pytest.raises(ValueError, match="on_bad"):
        read_jsonl(spark, path, DOC_FIELDS, on_bad="ignore")


def test_failfast_is_the_default_and_clean_input_passes(spark, tmp_path):
    path = _write_lines(
        tmp_path, ['{"doc_id": 7, "lang": "fr", "n": 1}']
    )
    df = read_jsonl(spark, path, DOC_FIELDS)
    assert df.collect()[0]["lang"] == "fr"


def test_gzip_shards_read_transparently(spark, tmp_path):
    d = tmp_path / "gz"
    d.mkdir()
    for i in range(3):
        with gzip.open(d / f"shard-{i}.jsonl.gz", "wt") as f:
            for j in range(5):
                f.write(
                    f'{{"doc_id": {i * 5 + j}, "lang": "en", "n": {j}}}\n'
                )
    df = read_jsonl(spark, str(d), DOC_FIELDS)
    assert df.count() == 15
    assert df.agg(F.sum("doc_id")).collect()[0][0] == sum(range(15))
    # one task per gzip file — the parallelism contract the docstring
    # warns about (gzip is not splittable)
    assert df.rdd.getNumPartitions() <= 3


def test_jsonl_feeds_an_mphf_build(spark, tmp_path):
    """Side-door parity: a JSONL dump is a first-class MPHF build
    source, same as read_sequences output."""
    from recsplit_spark.data import sequences
    from recsplit_spark.mphf import RecSplitBuilder

    n = 3000
    path = str(tmp_path / "seqs")
    write_jsonl(sequences(spark, n, partitions=4), path)
    df = read_sequences_jsonl(spark, path)
    desc = RecSplitBuilder(leaf_size=8, avg_bucket_size=128).build(
        df, "doc_id"
    )
    out = desc.evaluate(df, "doc_id")
    row = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("mphf_index").alias("d"),
        F.max("mphf_index").alias("hi"),
    ).collect()[0]
    assert (row["n"], row["d"], row["hi"]) == (n, n, n - 1)


def test_keep_partial_results_detected_via_corrupt_record(spark, tmp_path):
    """PERMISSIVE semantics Spark actually implements: a syntactically
    valid line with ONE type-bad field keeps its parseable fields
    (partial result, data fields NOT all null) — corruption must be
    detected via corrupt_record, never 'data field is null'."""
    path = _write_lines(
        tmp_path,
        [
            '{"doc_id": 1, "lang": "en", "n": 7}',
            '{"doc_id": 2, "lang": "de", "n": "oops"}',  # one bad field
            "not json at all",  # whole-line failure
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in read_jsonl(spark, path, DOC_FIELDS, on_bad="keep").collect()
    }
    assert rows[1]["corrupt_record"] is None
    # partial result: doc_id/lang survived, n is null, corrupt_record set
    assert rows[2]["lang"] == "de" and rows[2]["n"] is None
    assert rows[2]["corrupt_record"] is not None
    # whole-line failure: all data fields null, raw line preserved
    assert rows[None]["corrupt_record"] == "not json at all"


def test_keep_refuses_corrupt_record_name_collision(spark, tmp_path):
    path = _write_lines(tmp_path, ['{"doc_id": 1}'])
    with pytest.raises(ValueError, match="reserves the column name"):
        read_jsonl(
            spark, path,
            {"doc_id": "bigint", "corrupt_record": "string"},
            on_bad="keep",
        )


def test_read_input_relative_dir_fallback(spark, tmp_path, monkeypatch):
    """A bare relative directory name (no separator, no .parquet) must
    fall back to the path probe when no catalog table matches, instead
    of dying with TABLE_OR_VIEW_NOT_FOUND."""
    import os

    from recsplit_spark.io import read_input

    spark.range(5).write.parquet(str(tmp_path / "mydump"))
    monkeypatch.chdir(tmp_path)
    assert read_input(spark, "mydump").count() == 5
    with pytest.raises(ValueError, match="neither a catalog table"):
        read_input(spark, "no_such_thing")
