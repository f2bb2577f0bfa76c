"""Training-shard output + epoch ordering (pipeline/shards.py):
value-defined membership, deterministic layout, partition-pruned reads,
reproducible per-epoch permutations."""

import glob

import pytest
from pyspark.sql import functions as F

from recsplit_spark.pipeline import shards


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_shard_assignment_is_value_defined(spark, docs):
    """Same id -> same shard regardless of partitioning; ids spread
    across all shards roughly evenly."""
    a = {
        r["doc_id"]: r["shard"]
        for r in shards.with_shard(docs, "doc_id", 16).collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in shards.with_shard(
            docs.repartition(13), "doc_id", 16
        ).collect()
    }
    assert a == b
    assert all(0 <= s < 16 for s in a.values())
    from collections import Counter

    sizes = Counter(a.values())
    assert len(sizes) == 16
    assert max(sizes.values()) <= 2 * (len(a) / 16)
    with pytest.raises(ValueError):
        shards.shard_col("doc_id", 0)


def test_write_read_roundtrip_and_layout(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    shards.write_training_shards(docs, path, "doc_id", 8)
    back = shards.read_training_shards(spark, path)
    assert back.count() == docs.count()
    # membership on disk == the value-defined assignment
    want = {
        r["doc_id"]: r["shard"]
        for r in shards.with_shard(docs, "doc_id", 8).collect()
    }
    got = {r["doc_id"]: int(r["shard"]) for r in back.collect()}
    assert got == want
    # one file per shard; rows id-sorted within each shard file
    for k in range(8):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1
    one = [
        r["doc_id"]
        for r in spark.read.parquet(f"{path}/shard=3").collect()
    ]
    assert one == sorted(one)
    # re-run (overwrite) reproduces identical membership
    shards.write_training_shards(docs, path, "doc_id", 8, mode="overwrite")
    again = {
        r["doc_id"]: int(r["shard"])
        for r in shards.read_training_shards(spark, path).collect()
    }
    assert again == got


def test_shard_read_is_partition_pruned(spark, docs, tmp_path):
    path = str(tmp_path / "pruned")
    shards.write_training_shards(docs, path, "doc_id", 8)
    sub = shards.read_training_shards(spark, path, shards=[2, 5])
    assert set(
        r["shard"] for r in sub.select("shard").distinct().collect()
    ) == {2, 5}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan


def test_epoch_order_reproducible_and_distinct(spark, docs):
    ids0 = [
        r["doc_id"]
        for r in shards.epoch_order(docs, "doc_id", epoch=0).select(
            "doc_id"
        ).collect()
    ]
    ids0b = [
        r["doc_id"]
        for r in shards.epoch_order(
            docs.repartition(11), "doc_id", epoch=0
        ).select("doc_id").collect()
    ]
    ids1 = [
        r["doc_id"]
        for r in shards.epoch_order(docs, "doc_id", epoch=1).select(
            "doc_id"
        ).collect()
    ]
    assert ids0 == ids0b  # pure function of (ids, epoch)
    assert ids0 != ids1  # different epoch, different permutation
    assert sorted(ids0) == sorted(ids1)  # same corpus
    with pytest.raises(ValueError):
        shards.epoch_order(docs, "doc_id", 0, scope="bogus")


def test_epoch_order_shard_scope_adds_no_exchange(spark, docs, tmp_path):
    """scope='shard' permutes within partitions with ZERO exchange on a
    shard-partitioned read — the plan has no Exchange above the scan."""
    path = str(tmp_path / "es")
    shards.write_training_shards(docs, path, "doc_id", 4)
    back = shards.read_training_shards(spark, path)
    ordered = shards.epoch_order(back, "doc_id", epoch=3, scope="shard")
    plan = ordered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # still a permutation of the corpus
    assert sorted(
        r["doc_id"] for r in ordered.select("doc_id").collect()
    ) == sorted(r["doc_id"] for r in docs.select("doc_id").collect())
