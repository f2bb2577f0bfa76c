"""Literal grouped-agg UDAF surface (base.agg_estimate_column /
agg_state_column / register_sql_agg).

These wrap the sketch monoid as real Spark aggregate expressions for
groupBy().agg() and Spark SQL. Elementwise sketches (HLL, theta, CMS,
Bloom) make the one-concatenated-update fold bit-identical to the
partition-partial path, so the UDAF estimates/states must EQUAL the
aggregate()/states_by_key outputs exactly — that equality is the test.
"""

import pytest

from recsplit_spark.data import sequences
from recsplit_spark.sketches import (
    CountMinSketch,
    HyperLogLog,
    ThetaSketch,
)


@pytest.fixture(scope="module")
def seq_df(spark):
    return sequences(spark, 2000, partitions=4).cache()


def test_agg_estimate_column_matches_aggregate(spark, seq_df):
    hll = HyperLogLog(p=12)
    udaf = {
        (r["source"], r["est"])
        for r in seq_df.groupBy("source")
        .agg(hll.agg_estimate_column("doc_id", alias="est"))
        .collect()
    }
    scale_path = {
        (r["source"], r["estimate"])
        for r in hll.aggregate(seq_df, "doc_id", ["source"]).collect()
    }
    assert {s for s, _ in udaf} == {s for s, _ in scale_path}
    assert udaf == {(s, e) for s, e in scale_path}


def test_agg_state_column_matches_states_by_key(spark, seq_df):
    th = ThetaSketch(k=64)
    udaf = {
        (r["source"], bytes(r["state"]))
        for r in seq_df.groupBy("source")
        .agg(th.agg_state_column("doc_id"))
        .collect()
    }
    want = {
        (r["source"], bytes(r["state"]))
        for r in th.states_by_key(seq_df, "doc_id", ["source"]).collect()
    }
    assert udaf == want


def test_agg_state_column_value_sketch_roundtrips(spark, seq_df):
    """Value-input sketches get the JVM double cast; the returned state
    deserializes and answers quantiles."""
    from recsplit_spark.sketches import KLL

    kll = KLL(k=128)
    rows = (
        seq_df.groupBy("source").agg(kll.agg_state_column("n_tok")).collect()
    )
    for r in rows:
        st = kll.from_bytes(bytes(r["state"]))
        q50 = kll.quantile(st, 0.5)
        assert 16 <= q50 <= 16 + 497


def test_register_sql_agg_matches_dataframe_surface(spark, seq_df):
    hll = HyperLogLog(p=12)
    seq_df.createOrReplaceTempView("seqs_udaf")
    hll.register_sql_agg(spark, "hll_est_test")
    sql = {
        (r["source"], r["est"])
        for r in spark.sql(
            "SELECT source, hll_est_test(xxhash64(CAST(doc_id AS STRING)))"
            " AS est FROM seqs_udaf GROUP BY source"
        ).collect()
    }
    dfs = {
        (r["source"], r["est"])
        for r in seq_df.groupBy("source")
        .agg(hll.agg_estimate_column("doc_id", alias="est"))
        .collect()
    }
    assert sql == dfs


def test_estimateless_sketch_is_rejected_upfront():
    cms = CountMinSketch(eps=1e-3, delta=1e-3)
    with pytest.raises(ValueError, match="no scalar estimate"):
        cms.agg_estimate_column("doc_id")


def test_estimateless_state_column_still_works(spark, seq_df):
    cms = CountMinSketch(eps=1e-3, delta=1e-3)
    rows = (
        seq_df.groupBy("source").agg(cms.agg_state_column("n_tok")).collect()
    )
    totals = {
        r["source"]: cms.total(cms.from_bytes(bytes(r["state"]))) for r in rows
    }
    exact = {
        r["source"]: r["n"]
        for r in seq_df.groupBy("source").agg({"n_tok": "count"})
        .withColumnRenamed("count(n_tok)", "n")
        .collect()
    }
    assert totals == exact
