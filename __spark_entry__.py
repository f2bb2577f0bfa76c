"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: distributed RecSplit MPHF over the lineitem
composite key at sf0.001, evaluated through the serialized descriptor;
returns the bijection summary (the canonical minperf oracle,
RandomizedTest.java:1324-1347, as one row).

``queries()`` / ``oracle_sql()`` — per-operator correctness contract at
sf0.01 vs DuckDB. Sketch estimates are checked as *bound booleans*
(the oracle asserts TRUE; the Spark side computes |est-exact| against the
algorithm's published bound in-engine) except where the sketch is provably
exact on the data (CMS on low-cardinality columns). MPHF checks are exact
(count/distinct/min/max of a bijection are fully determined).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.mphf import MPHFDescriptor, RecSplitBuilder
    from recsplit_spark.session import ship_package

    ship_package(spark)
    li = _t(spark, "/root/testdata/sf0.001", "lineitem")
    # MPHF is defined over a key SET (minperf rejects duplicates,
    # FastGenerator.java:203-210): build over the distinct key universe
    keyed = li.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("pk")
    ).distinct()
    desc = RecSplitBuilder(leaf_size=8, avg_bucket_size=128).build(keyed, "pk")
    desc2 = MPHFDescriptor.from_bytes(desc.to_bytes())  # always via serialized form
    out = desc2.evaluate(keyed, "pk")
    return out.agg(
        F.count("*").alias("n_keys"),
        F.countDistinct("mphf_index").alias("distinct_idx"),
        F.min("mphf_index").alias("min_idx"),
        F.max("mphf_index").alias("max_idx"),
        F.lit(float(desc.bits_per_key)).alias("bits_per_key"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_mphf_bijection_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.mphf import MPHFDescriptor, RecSplitBuilder
    from recsplit_spark.session import ship_package

    ship_package(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("pk")
    ).distinct()
    desc = RecSplitBuilder(leaf_size=8, avg_bucket_size=128).build(li, "pk")
    out = MPHFDescriptor.from_bytes(desc.to_bytes()).evaluate(li, "pk")
    return out.agg(
        F.count("*").alias("n_keys"),
        F.countDistinct("mphf_index").alias("distinct_idx"),
        F.min("mphf_index").alias("min_idx"),
        F.max("mphf_index").alias("max_idx"),
    )


def _q_hll_distinct_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import HyperLogLog

    ship_package(spark)
    li = _t(spark, sf_dir, "lineitem")
    hll = HyperLogLog(p=14)
    est = hll.count_distinct(li, "l_orderkey")
    exact = li.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    ok = abs(est - exact) <= 3 * hll.relative_error * exact
    return spark.createDataFrame(
        [("hll_l_orderkey", int(exact), bool(ok))],
        "check_name string, exact_distinct bigint, within_bound boolean",
    )


def _q_hll_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import HyperLogLog

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents")
    hll = HyperLogLog(p=14)
    ests = {
        r["source"]: r["estimate"]
        for r in hll.aggregate(docs, "doc_id", ["source"]).collect()
    }
    exact = {
        r["source"]: r["d"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    rows = [
        (
            s,
            int(exact[s]),
            # 3-sigma relative bound with small-count absolute slack (the
            # error is quantized by register collisions at tiny n)
            bool(abs(ests[s] - exact[s]) <= max(3 * hll.relative_error * exact[s], 3.0)),
        )
        for s in sorted(exact)
    ]
    return spark.createDataFrame(
        rows, "source string, exact_distinct bigint, within_bound boolean"
    )


def _q_cms_returnflag_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import CountMinSketch

    ship_package(spark)
    li = _t(spark, sf_dir, "lineitem")
    cms = CountMinSketch(eps=0.0005, delta=0.01)
    state = cms.build(li, "l_returnflag")
    # wide sketch vs 3 distinct values -> provably exact here (no row of the
    # sketch collides); compared as exact counts
    return (
        cms.frequencies(li, "l_returnflag", state)
        .select(F.col("l_returnflag"), F.col("freq_est").alias("freq"))
        .orderBy("l_returnflag")
    )


def _q_cms_eventtype_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import CountMinSketch

    ship_package(spark)
    ev = _t(spark, sf_dir, "events")
    cms = CountMinSketch(eps=0.0005, delta=0.01)
    state = cms.build(ev, "event_type")
    return (
        cms.frequencies(ev, "event_type", state)
        .select(F.col("event_type"), F.col("freq_est").alias("freq"))
        .orderBy("event_type")
    )


def _q_bloom_orders_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import BloomFilter

    ship_package(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    bl = BloomFilter(n_expected=max(64, cust.count()), fpr=0.01)
    state = bl.build(cust, "c_custkey")
    passed = bl.might_contain(orders, "o_custkey", state)
    # no false negatives: every true member must pass; count member rows
    # that passed (== semi-join count in the oracle)
    member_pass = passed.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(), "o_custkey"
    ).filter(F.col("might_contain"))
    return member_pass.agg(F.count("*").alias("n_member_rows_passed"))


def _q_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import KLL

    ship_package(spark)
    li = _t(spark, sf_dir, "lineitem")
    kll = KLL(k=256)
    state = kll.build(li, "l_extendedprice")
    n = li.count()
    rows = []
    for q in (0.1, 0.5, 0.9):
        est = kll.quantile(state, q)
        rank = li.filter(F.col("l_extendedprice") <= est).count() / n
        rows.append((float(q), bool(abs(rank - q) <= kll.epsilon)))
    return spark.createDataFrame(rows, "q double, within_bound boolean")


def _q_tdigest_event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from recsplit_spark.session import ship_package
    from recsplit_spark.sketches import TDigest

    ship_package(spark)
    ev = _t(spark, sf_dir, "events")
    td = TDigest(compression=200)
    state = td.build(ev, "value")
    n = ev.count()
    rows = []
    for q in (0.01, 0.5, 0.99):
        est = td.quantile(state, q)
        rank = ev.filter(F.col("value") <= est).count() / n
        rows.append((float(q), bool(abs(rank - q) <= 4.0 / td.compression)))
    return spark.createDataFrame(rows, "q double, within_bound boolean")


def _q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_text"),
        (F.count("*") - F.countDistinct("text")).alias("n_dup_docs"),
    )


def _q_distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mphf_bijection_lineitem": _q_mphf_bijection_lineitem,
        "hll_distinct_orderkey": _q_hll_distinct_orderkey,
        "hll_distinct_by_source": _q_hll_distinct_by_source,
        "cms_returnflag_freq": _q_cms_returnflag_freq,
        "cms_eventtype_freq": _q_cms_eventtype_freq,
        "bloom_orders_prefilter": _q_bloom_orders_prefilter,
        "kll_price_quantiles": _q_kll_price_quantiles,
        "tdigest_event_value_quantiles": _q_tdigest_event_value_quantiles,
        "dedup_exact_documents": _q_dedup_exact_documents,
        "distinct_users_exact": _q_distinct_users_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mphf_bijection_lineitem": (
            "SELECT CAST(count(DISTINCT l_orderkey || '-' || l_linenumber) AS BIGINT) AS n_keys,"
            " CAST(count(DISTINCT l_orderkey || '-' || l_linenumber) AS BIGINT) AS distinct_idx,"
            " CAST(0 AS BIGINT) AS min_idx,"
            " CAST(count(DISTINCT l_orderkey || '-' || l_linenumber) - 1 AS BIGINT) AS max_idx"
            " FROM lineitem"
        ),
        "hll_distinct_orderkey": (
            "SELECT 'hll_l_orderkey' AS check_name,"
            " CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,"
            " TRUE AS within_bound FROM lineitem"
        ),
        "hll_distinct_by_source": (
            "SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_distinct,"
            " TRUE AS within_bound FROM documents GROUP BY source ORDER BY source"
        ),
        "cms_returnflag_freq": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS freq"
            " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "cms_eventtype_freq": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS freq"
            " FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "bloom_orders_prefilter": (
            "SELECT CAST(count(*) AS BIGINT) AS n_member_rows_passed FROM orders"
            " WHERE o_custkey IN (SELECT c_custkey FROM customer)"
        ),
        "kll_price_quantiles": (
            "SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound FROM"
            " (VALUES (0.1), (0.5), (0.9)) AS t(q)"
        ),
        "tdigest_event_value_quantiles": (
            "SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound FROM"
            " (VALUES (0.01), (0.5), (0.99)) AS t(q)"
        ),
        "dedup_exact_documents": (
            "SELECT CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_text,"
            " CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs"
            " FROM documents"
        ),
        "distinct_users_exact": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,"
            " CAST(count(*) AS BIGINT) AS n_events FROM events"
            " GROUP BY event_type ORDER BY event_type"
        ),
    }
