"""MPHF-fingerprint membership filter (reference use-case README.md:10,
xor-filter evaluator src/main/c/filter/xor.c:91-141)."""

import pyspark.sql.functions as F
import pytest

from recsplit_spark.data import sequences
from recsplit_spark.filters import MPHFFilter
from recsplit_spark.session import ship_package


@pytest.fixture(scope="module")
def members(spark):
    ship_package(spark)
    return sequences(spark, 10_000, partitions=4).cache()


@pytest.fixture(scope="module")
def filt(members):
    return MPHFFilter.build(members, "doc_id")


def test_no_false_negatives(members, filt):
    out = filt.might_contain(members, "doc_id")
    assert out.filter(~F.col("might_contain")).count() == 0


def test_false_positive_rate(spark, members, filt):
    # fresh keys disjoint from the build set (different prefix)
    probes = spark.range(0, 40_000).select(
        F.concat(F.lit("nonmember-"), F.col("id")).alias("doc_id")
    )
    fp = filt.might_contain(probes, "doc_id").filter("might_contain").count()
    rate = fp / 40_000
    # expected 1/256 ~ 0.0039; 40k probes -> sigma ~ 0.0003
    assert rate < 0.006, rate


def test_serde_roundtrip(members, filt):
    f2 = MPHFFilter.from_bytes(filt.to_bytes())
    out = f2.might_contain(members, "doc_id")
    assert out.filter(~F.col("might_contain")).count() == 0
    assert f2.fp_bits == filt.fp_bits and f2.desc.n == filt.desc.n


def test_space(filt):
    # ~1.93 (MPHF) + 8 (fingerprint) bits/key
    assert filt.bits_per_key < 10.5
    assert filt.false_positive_rate == pytest.approx(1 / 256)


def test_build_scale_10m_driver_sees_fragments_not_rows(spark):
    """Scale gate (VERDICT round-1 item 1): 10^7-key build must assemble the
    fingerprint table from dense per-partition fragments — the driver
    receives ~P rows totaling exactly n bytes, never n (idx, fp) rows."""
    ship_package(spark)
    df = spark.range(10_000_000).select(F.col("id").alias("k"))
    filt = MPHFFilter.build(df, "k")
    assert filt.desc.n == 10_000_000
    # driver-side result: one row per range partition, n bytes total
    # (total == n is enforced inside build; a toPandas regression would
    # blow the fragment count far past the parallelism bound)
    assert 1 <= filt.n_build_fragments <= spark.sparkContext.defaultParallelism * 4
    assert len(filt.fp) == 10_000_000
    # zero false negatives on a member sample
    sample = df.sample(0.001, seed=1)
    out = filt.might_contain(sample, "k")
    assert out.filter(~F.col("might_contain")).count() == 0


# -- XOR filter (reference filter/xor.c) ----------------------------------------

@pytest.fixture(scope="module")
def xfilt(members):
    from recsplit_spark.filters import XorFilter

    return XorFilter.build(members, "doc_id")


def test_xor_no_false_negatives(members, xfilt):
    out = xfilt.might_contain(members, "doc_id")
    assert out.filter(~F.col("might_contain")).count() == 0


def test_xor_false_positive_rate(spark, members, xfilt):
    probes = spark.range(0, 40_000).select(
        F.concat(F.lit("nonmember-"), F.col("id")).alias("doc_id")
    )
    fp = xfilt.might_contain(probes, "doc_id").filter("might_contain").count()
    assert fp / 40_000 < 0.006, fp / 40_000


def test_xor_serde_roundtrip(members, xfilt):
    from recsplit_spark.filters import XorFilter

    f2 = XorFilter.from_bytes(xfilt.to_bytes())
    assert f2.to_bytes() == xfilt.to_bytes()
    out = f2.might_contain(members, "doc_id")
    assert out.filter(~F.col("might_contain")).count() == 0


def test_xor_space(xfilt):
    # gamma * fp_bits = 1.23 * 8 ~ 9.84 bits/key + header
    assert xfilt.bits_per_key < 10.0
    assert xfilt.false_positive_rate == pytest.approx(1 / 256)


def test_xor_duplicate_keys_raise(spark):
    from recsplit_spark.filters import XorFilter

    dup = spark.range(500).select(
        F.concat(F.lit("k"), (F.col("id") % 250)).alias("doc_id")
    )
    with pytest.raises(RuntimeError, match="salt re-rolls"):
        XorFilter.build(dup, "doc_id")


def test_filters_sql_surface(spark, members, filt, xfilt):
    """SQL probes agree with the DataFrame probes on members (all True)
    and on non-members (bitwise-identical verdicts)."""
    filt.register_sql(spark, "mf_contains")
    xfilt.register_sql(spark, "xf_contains")
    members.createOrReplaceTempView("member_keys")
    r = spark.sql(
        "SELECT count(*) n,"
        " sum(CASE WHEN mf_contains(doc_id) THEN 1 ELSE 0 END) m,"
        " sum(CASE WHEN xf_contains(doc_id) THEN 1 ELSE 0 END) x"
        " FROM member_keys"
    ).collect()[0]
    assert r["n"] == r["m"] == r["x"]
    probes = spark.range(0, 5_000).selectExpr(
        "concat('nonmember-', id) AS doc_id"
    )
    probes.createOrReplaceTempView("probe_keys")
    sql_v = spark.sql(
        "SELECT doc_id, mf_contains(doc_id) a, xf_contains(doc_id) b FROM probe_keys"
    )
    df_v = xfilt.might_contain(
        filt.might_contain(probes, "doc_id", "a2"), "doc_id", "b2"
    )
    joined = sql_v.join(df_v, "doc_id")
    assert joined.filter("a <> a2 OR b <> b2").count() == 0


# ---------------------------------------------------------------------------
# semi-join reduction (prefiltered_join / prefiltered_anti_join)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def join_fixture(spark):
    """big: 20k fact rows keyed 0..9999 (2 rows/key); dim: the 500 keys
    divisible by 20, with a payload column."""
    ship_package(spark)
    big = spark.range(20_000).select(
        (F.col("id") % 10_000).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(500).select(
        (F.col("id") * 20).alias("k"), (F.col("id") + 100).alias("w")
    )
    return big.cache(), dim.cache()


@pytest.mark.parametrize("kind", ["xor", "mphf"])
def test_prefiltered_join_equals_plain_join(spark, join_fixture, kind):
    from recsplit_spark.filters import prefiltered_join

    big, dim = join_fixture
    got = prefiltered_join(big, dim, "k", kind=kind).sort("k", "v")
    want = big.join(dim, ["k"]).sort("k", "v")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_prefiltered_join_left_semi_and_how_validation(join_fixture):
    from recsplit_spark.filters import prefiltered_join

    big, dim = join_fixture
    got = prefiltered_join(big, dim, "k", how="left_semi")
    want = big.join(dim, ["k"], "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    for how in ("left", "left_anti", "full"):
        with pytest.raises(ValueError, match="prefiltered_join supports"):
            prefiltered_join(big, dim, "k", how=how)


def test_prefiltered_join_key_rename(join_fixture):
    from recsplit_spark.filters import prefiltered_join

    big, dim = join_fixture
    dim2 = dim.withColumnRenamed("k", "dim_key")
    got = prefiltered_join(big, dim2, "dim_key", big_key_col="k")
    want = big.join(dim2.withColumnRenamed("dim_key", "k"), ["k"])
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_semi_join_prefilter_selectivity_and_reuse(join_fixture):
    """The prefilter keeps all 1,000 matching rows plus ~FPR of the
    18,000 non-matching ones; a prebuilt filter is reused verbatim."""
    from recsplit_spark.filters import semi_join_prefilter

    big, dim = join_fixture
    filtered, filt = semi_join_prefilter(big, dim, "k")
    n = filtered.count()
    # 1,000 true rows; false positives ~ 19k * 2 rows/key * 1/256 ~ 74
    assert 1_000 <= n <= 1_000 + 500, n
    again, same = semi_join_prefilter(big, dim, "k", filt=filt)
    assert same is filt
    assert again.count() == n


def test_prefiltered_anti_join_equals_plain_anti(join_fixture):
    from recsplit_spark.filters import prefiltered_anti_join

    big, dim = join_fixture
    got = prefiltered_anti_join(big, dim.select("k"), "k")
    want = big.join(dim, ["k"], "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == big.columns


def test_prefiltered_join_accepts_duplicate_dim_keys(join_fixture):
    """The filter is built over the key SET: a many-to-many dim (or
    duplicated blocklist) must not trip the duplicate-rejecting
    MPHF/xor builds, and the join output keeps the duplicates exactly
    like the plain join."""
    from recsplit_spark.filters import prefiltered_anti_join, prefiltered_join

    big, dim = join_fixture
    dup_dim = dim.unionByName(dim)  # every key twice
    got = prefiltered_join(big, dup_dim, "k")
    want = big.join(dup_dim, ["k"])
    assert got.count() == want.count()
    anti = prefiltered_anti_join(big, dup_dim.select("k"), "k")
    assert anti.count() == big.join(dup_dim, ["k"], "left_anti").count()


def test_prefiltered_join_key_mode_mismatch_raises(spark, join_fixture):
    """String-typed keys on one side hash different bytes than the
    integral build — a silent false-negative trap; must raise."""
    import pyspark.sql.functions as F

    from recsplit_spark.filters import prefiltered_anti_join, prefiltered_join

    big, dim = join_fixture
    big_str = big.withColumn("k", F.col("k").cast("string"))
    with pytest.raises(ValueError, match="key-mode mismatch"):
        prefiltered_join(big_str, dim, "k")
    with pytest.raises(ValueError, match="key-mode mismatch"):
        prefiltered_anti_join(big_str, dim.select("k"), "k")


def test_prefiltered_join_mphf_salt_rejected(join_fixture):
    from recsplit_spark.filters import prefiltered_join

    big, dim = join_fixture
    with pytest.raises(ValueError, match="kind='xor'"):
        prefiltered_join(big, dim, "k", kind="mphf", salt=7)
