"""Key-file sources (SURVEY §2.1 S3/S4): newline-delimited text keys and
the globally-sorted signature table with sorted-scan duplicate
detection."""

import numpy as np
from pyspark.sql import functions as F

from recsplit_spark.io import (
    read_keys_text,
    read_sorted_signatures,
    signature_duplicates,
    write_sorted_signatures,
)


def _write_text(tmp_path, lines, name="keys.txt"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_keys_text(spark, tmp_path):
    path = _write_text(tmp_path, ["alpha", "beta", "", "gamma"])
    keys = [r["doc_id"] for r in read_keys_text(spark, path).collect()]
    assert sorted(keys) == ["alpha", "beta", "gamma"]  # blank dropped
    with_blank = read_keys_text(spark, path, skip_blank=False).count()
    assert with_blank == 4


def test_text_keys_feed_an_mphf_build(spark, tmp_path):
    """S3 end-to-end: a text key file is a first-class build source —
    hashing happens in-engine exactly as for any other frame."""
    from recsplit_spark.mphf import RecSplitBuilder

    n = 3000
    path = _write_text(tmp_path, [f"key-{i:06d}" for i in range(n)])
    df = read_keys_text(spark, path, key_col="k")
    desc = RecSplitBuilder(leaf_size=8, avg_bucket_size=128).build(df, "k")
    out = desc.evaluate(df, "k")
    row = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("mphf_index").alias("d"),
        F.min("mphf_index").alias("lo"),
        F.max("mphf_index").alias("hi"),
    ).collect()[0]
    assert (row["n"], row["d"], row["lo"], row["hi"]) == (n, n, 0, n - 1)


def test_sorted_signatures_roundtrip_and_order(spark, tmp_path):
    from recsplit_spark.data import sequences
    from recsplit_spark.mphf import key_mode_for, key_sig_expr

    df = sequences(spark, 5000, partitions=4)
    path = str(tmp_path / "sigs")
    write_sorted_signatures(df, "doc_id", path, salt=3)
    back = read_sorted_signatures(spark, path)
    got = np.array([r["sig"] for r in back.orderBy("sig").collect()])
    mode = key_mode_for(df, "doc_id")
    want = np.sort(
        np.array(
            [
                r["s"]
                for r in df.select(
                    key_sig_expr("doc_id", 3, mode).alias("s")
                ).collect()
            ]
        )
    )
    assert np.array_equal(got, want)
    # written FILES are internally sorted (per-partition order on a
    # re-read would depend on FilePartition bin-packing — the very
    # hazard signature_duplicates documents for assume_sorted)
    rows = back.withColumn("f", F.input_file_name()).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["sig"])
    for vals in by_file.values():
        assert all(a <= b for a, b in zip(vals, vals[1:]))


def test_signature_duplicates_counts(spark, tmp_path):
    # doc ids with planted duplicates: 'dup-A' x3, 'dup-B' x2
    ids = [f"u{i}" for i in range(2000)] + ["dup-A"] * 3 + ["dup-B"] * 2
    df = spark.createDataFrame([(x,) for x in ids], "doc_id string")
    from recsplit_spark.mphf import key_mode_for, key_sig_expr

    mode = key_mode_for(df, "doc_id")
    sigs = df.select(key_sig_expr("doc_id", 0, mode).alias("sig"))
    dups = {r["sig"]: r["n_dups"] for r in signature_duplicates(sigs).collect()}
    sig_of = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", key_sig_expr("doc_id", 0, mode).alias("s")
        ).collect()
    }
    assert dups[sig_of["dup-A"]] == 2  # count excludes first occurrence
    assert dups[sig_of["dup-B"]] == 1
    assert len(dups) == 2
    # unique universe -> empty
    uniq = df.dropDuplicates(["doc_id"]).select(
        key_sig_expr("doc_id", 0, mode).alias("sig")
    )
    assert signature_duplicates(uniq).count() == 0
    # assume_sorted on an in-memory range-partitioned sorted frame
    pre = sigs.repartitionByRange("sig").sortWithinPartitions("sig")
    dups2 = {
        r["sig"]: r["n_dups"]
        for r in signature_duplicates(pre, assume_sorted=True).collect()
    }
    assert dups2 == dups
