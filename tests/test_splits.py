"""Deterministic stratified splits: exactness of the u contract,
proportions, monotone stability, plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from recsplit_spark.pipeline.splits import (
    _U_SPAN,
    split_cuts,
    split_u_expr,
    stratified_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.col("id"), F.lit(7)).cast("string").alias("source"),
    )


def test_u_matches_reference_md5(spark):
    df = spark.createDataFrame([(123,), (9999,)], "doc_id long")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select("doc_id", split_u_expr("doc_id").alias("u")).collect()
    }
    for k in (123, 9999):
        want = int(hashlib.md5(f"split:{k}".encode()).hexdigest()[:12], 16)
        assert got[k] == want


def test_cut_contract():
    cuts = split_cuts({"train": 0.8, "val": 0.1, "test": 0.1})
    assert cuts[0] == ("train", int(0.8 * _U_SPAN))
    assert cuts[1] == ("val", int(0.9 * _U_SPAN))
    assert cuts[2] == ("test", _U_SPAN)  # pinned exhaustive
    with pytest.raises(ValueError, match="sum to 1"):
        split_cuts({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="> 0"):
        split_cuts({"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="non-empty"):
        split_cuts({})


def test_proportions_and_exhaustive(ids):
    out = stratified_split(ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 20_000  # exhaustive, exactly one label
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01
    # stratified in expectation: every source's train share is ~0.8
    per_src = (
        out.groupBy("source")
        .agg(
            (
                F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
                / F.count("*")
            ).alias("frac")
        )
        .collect()
    )
    for r in per_src:
        assert abs(r["frac"] - 0.8) < 0.05


def test_partition_independence_and_salt(ids):
    f = {"train": 0.9, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in stratified_split(ids, "doc_id", f).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in stratified_split(ids.repartition(13), "doc_id", f).collect()
    }
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in stratified_split(ids, "doc_id", f, salt="other").collect()
    }
    assert a != c  # a different salt draws an independent split


def test_monotone_stability(ids):
    small = stratified_split(ids, "doc_id", {"train": 0.7, "val": 0.3})
    big = stratified_split(ids, "doc_id", {"train": 0.9, "val": 0.1})
    t_small = {r["doc_id"] for r in small.filter(F.col("split") == "train").collect()}
    t_big = {r["doc_id"] for r in big.filter(F.col("split") == "train").collect()}
    assert t_small <= t_big  # growing train only ever absorbs, never evicts


def test_split_plan_is_pure_projection(ids):
    plan = (
        stratified_split(ids, "doc_id", {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no Python on the scan path


def test_split_leakage_flags_planted_overlap(spark):
    """Docs share ids-disjoint splits but doc 7 (train) carries a
    verbatim 13-token window from doc 3 (val): the audit must flag
    exactly doc 7, count its windows, and never flag holdout rows."""
    from recsplit_spark.pipeline.splits import split_leakage

    rows = []
    for i in range(40):
        rows.append((i, [1000 * i + j for j in range(30)]))
    # find a train doc and a val doc under the default salt
    labeled = stratified_split(
        spark.createDataFrame(rows, "doc_id long, tokens array<int>"),
        "doc_id",
        {"train": 0.6, "val": 0.2, "test": 0.2},
    )
    by_split = {
        r["doc_id"]: r["split"] for r in labeled.select("doc_id", "split").collect()
    }
    train_id = next(i for i in range(40) if by_split[i] == "train")
    val_id = next(i for i in range(40) if by_split[i] == "val")
    # plant: train doc's tokens 10..22 == val doc's tokens 0..12
    rows2 = []
    for i, toks in rows:
        if i == train_id:
            toks = toks[:10] + [1000 * val_id + j for j in range(13)] + toks[23:]
        rows2.append((i, toks))
    labeled2 = stratified_split(
        spark.createDataFrame(rows2, "doc_id long, tokens array<int>"),
        "doc_id",
        {"train": 0.6, "val": 0.2, "test": 0.2},
    )
    audit = split_leakage(labeled2, "doc_id", "tokens")
    flagged = {
        r["doc_id"]: r["contam_windows"]
        for r in audit.filter("contaminated").collect()
    }
    assert flagged == {train_id: 1}
    # only non-holdout rows are audited
    audited = {r["doc_id"] for r in audit.collect()}
    assert by_split[val_id] != "train" and val_id not in audited
    assert audited == {i for i in range(40) if by_split[i] == "train"}


def test_split_leakage_join_method_matches_probe(spark):
    """The corpus-scale join path returns row-identical results to the
    driver-probe path (same hash-pair contract on both sides)."""
    from recsplit_spark.pipeline.splits import split_leakage

    rows = [(i, [1000 * i + j for j in range(30)]) for i in range(60)]
    labeled = stratified_split(
        spark.createDataFrame(rows, "doc_id long, tokens array<int>"),
        "doc_id",
        {"train": 0.5, "val": 0.25, "test": 0.25},
    )
    by_split = {
        r["doc_id"]: r["split"] for r in labeled.select("doc_id", "split").collect()
    }
    train_ids = [i for i in range(60) if by_split[i] == "train"]
    val_id = next(i for i in range(60) if by_split[i] == "val")
    rows2 = []
    for i, toks in rows:
        if i in train_ids[:3]:  # plant into three train docs
            toks = toks[:5] + [1000 * val_id + j for j in range(13)] + toks[18:]
        rows2.append((i, toks))
    labeled2 = stratified_split(
        spark.createDataFrame(rows2, "doc_id long, tokens array<int>"),
        "doc_id",
        {"train": 0.5, "val": 0.25, "test": 0.25},
    )
    probe = sorted(
        (r["doc_id"], r["contam_windows"], r["contaminated"])
        for r in split_leakage(labeled2, "doc_id", "tokens").collect()
    )
    join = sorted(
        (r["doc_id"], r["contam_windows"], r["contaminated"])
        for r in split_leakage(
            labeled2, "doc_id", "tokens", method="join"
        ).collect()
    )
    assert probe == join
    assert sum(1 for _, _, c in probe if c) == 3
    with pytest.raises(ValueError, match="probe.*join|join.*probe"):
        split_leakage(labeled2, "doc_id", "tokens", method="nope")
