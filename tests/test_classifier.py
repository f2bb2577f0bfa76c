"""Learned quality classifier (pipeline/classifier.py): distributed IRLS
vs a pure-numpy reference, weight recovery on a known generating rule,
Column-expression scoring identity, serde, and input validation."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from recsplit_spark.pipeline.classifier import (
    LogisticQualityModel, _log1pexp, _sigmoid,
)
from recsplit_spark.session import ship_package

TRUE_W = np.array([2.0, -1.0, 0.5])
TRUE_B = -0.25


@pytest.fixture(scope="module")
def fixture_df(spark):
    """Deterministic uniforms from xxhash64; labels from a known linear
    rule (separable — ridge keeps the fit finite)."""
    ship_package(spark)
    df = spark.range(4000)
    us = []
    for i in range(3):
        u = (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1 << 20)) /
             F.lit(float(1 << 20)))
        us.append(u.alias(f"u{i}"))
    df = df.select("id", *us)
    eta = (F.lit(TRUE_B) + F.lit(TRUE_W[0]) * F.col("u0")
           + F.lit(TRUE_W[1]) * F.col("u1") + F.lit(TRUE_W[2]) * F.col("u2"))
    return df.withColumn("label", (eta > 0).cast("int")).cache()


@pytest.fixture(scope="module")
def fitted(fixture_df):
    return LogisticQualityModel.fit(
        fixture_df, ["u0", "u1", "u2"], "label", ridge=1e-3
    )


def _numpy_irls(X, y, ridge, max_iter=25, tol=1e-8):
    """The same damped-Newton algorithm, single-node — the distributed
    fit must agree (float-sum order differences only)."""
    n, d = X.shape
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Z = np.hstack([np.ones((n, 1)), (X - mu) / sd])
    w = np.zeros(d + 1)

    def loss_of(wv):
        eta = Z @ wv
        return float(np.sum(_log1pexp(eta) - y * eta))

    for _ in range(max_iter):
        eta = Z @ w
        p = _sigmoid(eta)
        g = Z.T @ (y - p) - n * ridge * np.r_[0.0, w[1:]]
        W = p * (1 - p)
        H = (Z * W[:, None]).T @ Z + n * ridge * np.diag([0.0] + [1.0] * d)
        step = np.linalg.solve(H, g)
        base = loss_of(w)
        for _h in range(6):
            if loss_of(w + step) <= base + 1e-12 * max(1.0, abs(base)):
                break
            step *= 0.5
        w = w + step
        if np.max(np.abs(step)) < tol:
            break
    return mu, sd, w


def test_fit_matches_numpy_reference(fixture_df, fitted):
    pdf = fixture_df.select("u0", "u1", "u2", "label").toPandas()
    X = pdf[["u0", "u1", "u2"]].to_numpy(dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    mu, sd, w = _numpy_irls(X, y, ridge=1e-3)
    assert np.allclose(fitted.mu, mu, rtol=1e-9)
    assert np.allclose(fitted.sd, sd, rtol=1e-9)
    assert np.allclose(fitted.weights, w[1:], rtol=1e-5, atol=1e-7)
    assert fitted.bias == pytest.approx(w[0], rel=1e-5)


def test_weight_recovery_and_accuracy(fixture_df, fitted):
    # direction recovery: standardized fitted weights, mapped back to
    # raw space (w_i / sd_i), align with the generating rule
    raw_w = fitted.weights / fitted.sd
    cos = raw_w @ TRUE_W / (np.linalg.norm(raw_w) * np.linalg.norm(TRUE_W))
    assert cos > 0.99, cos
    scored = fitted.with_score(fixture_df)
    acc = scored.filter(
        ((F.col("quality_score") >= 0.5).cast("int") == F.col("label"))
    ).count() / fixture_df.count()
    assert acc > 0.98, acc
    # training loss decreased monotonically (damped Newton)
    h = fitted.loss_history
    assert len(h) >= 3 and all(b <= a + 1e-12 for a, b in zip(h, h[1:])), h


def test_score_expr_matches_driver_kernel(fixture_df, fitted):
    pdf = fitted.with_score(fixture_df).select(
        "u0", "u1", "u2", "quality_score"
    ).toPandas()
    X = pdf[["u0", "u1", "u2"]].to_numpy(dtype=np.float64)
    want = fitted.score_array(X)
    assert np.allclose(pdf["quality_score"].to_numpy(), want, atol=1e-12)


def test_partition_invariance(fixture_df):
    a = LogisticQualityModel.fit(
        fixture_df.repartition(3), ["u0", "u1", "u2"], "label", ridge=1e-3
    )
    b = LogisticQualityModel.fit(
        fixture_df.repartition(17), ["u0", "u1", "u2"], "label", ridge=1e-3
    )
    assert np.allclose(a.weights, b.weights, rtol=1e-6)
    assert a.bias == pytest.approx(b.bias, rel=1e-6)


def test_serde_roundtrip(fixture_df, fitted):
    back = LogisticQualityModel.from_bytes(fitted.to_bytes())
    assert back.feature_cols == fitted.feature_cols
    assert np.array_equal(back.mu, fitted.mu)
    assert np.array_equal(back.sd, fitted.sd)
    assert np.array_equal(back.weights, fitted.weights)
    assert back.bias == fitted.bias
    X = np.array([[0.1, 0.9, 0.4], [0.7, 0.2, 0.8]])
    assert np.array_equal(back.score_array(X), fitted.score_array(X))


def test_input_validation(spark, fixture_df):
    with pytest.raises(ValueError, match="must be numeric"):
        LogisticQualityModel.fit(
            fixture_df.withColumn("s", F.lit("x")), ["s"], "label"
        )
    with pytest.raises(ValueError, match="must be 0/1"):
        LogisticQualityModel.fit(
            fixture_df.withColumn("bad", F.col("u0") * 2), ["u0"], "bad"
        )
    with pytest.raises(ValueError, match="one class"):
        LogisticQualityModel.fit(
            fixture_df.withColumn("one", F.lit(1)), ["u0"], "one"
        )
    with pytest.raises(ValueError, match="constant feature"):
        LogisticQualityModel.fit(
            fixture_df.withColumn("c", F.lit(3.0)), ["c"], "label"
        )


def test_null_rows_dropped(spark):
    ship_package(spark)
    df = spark.range(400).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise((F.col("id") % 7).cast("double")).alias("x"),
        ((F.col("id") % 7) >= 3).cast("int").alias("label"),
    )
    m = LogisticQualityModel.fit(df, ["x"], "label", ridge=1e-3)
    assert m.weights[0] > 0  # higher x -> label 1 on the kept rows


def test_gopher_integration_smoke(spark, sf_dir):
    """Fit over REAL engine-computed quality features on the documents
    table; scores must be valid probabilities and separate the derived
    label better than chance."""
    from recsplit_spark.pipeline.text import with_quality_stats

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = with_quality_stats(docs, "text").withColumn(
        "label", (F.length("text") > 200).cast("int")
    )
    num_cols = ["n_tokens", "avg_token_len", "stop_ratio_en"]
    m = LogisticQualityModel.fit(feats, num_cols, "label", ridge=1e-4)
    s = m.with_score(feats).agg(
        F.min("quality_score"), F.max("quality_score")
    ).collect()[0]
    assert 0.0 <= s[0] <= s[1] <= 1.0


# -- pure-numpy property tests (no Spark) ------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_sigmoid_log1pexp_stable_property(x):
    a = np.array([x])
    s = _sigmoid(a)[0]
    assert 0.0 <= s <= 1.0
    l = _log1pexp(a)[0]
    assert np.isfinite(l) and l >= max(x, 0.0) - 1e-9
    # complementary identities
    assert _sigmoid(-a)[0] == pytest.approx(1.0 - s, abs=1e-12)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(0, 2**31 - 1),
)
def test_model_serde_roundtrip_property(d, seed):
    rng = np.random.default_rng(seed)
    m = LogisticQualityModel(
        [f"f{i}" for i in range(d)],
        rng.normal(size=d),
        np.abs(rng.normal(size=d)) + 1e-3,
        rng.normal(size=d),
        float(rng.normal()),
        [],
    )
    back = LogisticQualityModel.from_bytes(m.to_bytes())
    assert back.feature_cols == m.feature_cols
    assert np.array_equal(back.mu, m.mu)
    assert np.array_equal(back.sd, m.sd)
    assert np.array_equal(back.weights, m.weights)
    assert back.bias == m.bias
    X = rng.normal(size=(5, d))
    assert np.array_equal(back.score_array(X), m.score_array(X))


# -- exact distributed AUC ----------------------------------------------------

from recsplit_spark.pipeline.classifier import auc_exact


def _auc_ref(scores, labels):
    """Average-rank Mann-Whitney reference (single-node)."""
    order = np.argsort(scores, kind="mergesort")
    s, y = np.asarray(scores)[order], np.asarray(labels)[order]
    ranks = np.empty(len(s))
    i, r = 0, 1
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (2 * r + (j - i) - 1) / 2
        r += j - i
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2
    return u / (n_pos * n_neg), int(round(2 * u)), n_pos, n_neg


def test_auc_exact_matches_reference_with_ties(spark):
    ship_package(spark)
    rng = np.random.default_rng(11)
    scores = rng.integers(0, 25, 3000).astype(float)  # heavy ties
    labels = (rng.random(3000) < 1 / (1 + np.exp(-(scores - 12) / 5)))
    df = spark.createDataFrame(
        [(float(s), int(l)) for s, l in zip(scores, labels)], "s double, y int"
    )
    got = auc_exact(df, "s", "y")
    auc, numer2, n_pos, n_neg = _auc_ref(scores, labels.astype(int))
    assert got["numer2"] == numer2
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert got["auc"] == pytest.approx(auc, abs=1e-12)


def test_auc_exact_edge_cases(spark):
    ship_package(spark)
    # perfect separation -> 1; reversed -> 0; all-tied -> exactly 0.5
    perfect = spark.createDataFrame(
        [(float(i), int(i >= 50)) for i in range(100)], "s double, y int"
    )
    assert auc_exact(perfect, "s", "y")["auc"] == 1.0
    rev = perfect.selectExpr("-s AS s", "y")
    assert auc_exact(rev, "s", "y")["auc"] == 0.0
    tied = spark.createDataFrame(
        [(1.0, i % 3 == 0) for i in range(90)], "s double, y boolean"
    ).selectExpr("s", "CAST(y AS INT) AS y")
    t = auc_exact(tied, "s", "y")
    assert t["auc"] == 0.5 and t["numer2"] == t["n_pos"] * t["n_neg"]
    one_class = spark.createDataFrame(
        [(float(i), 1) for i in range(10)], "s double, y int"
    )
    with pytest.raises(ValueError, match="both classes"):
        auc_exact(one_class, "s", "y")


def test_auc_exact_partition_invariance(spark):
    ship_package(spark)
    rng = np.random.default_rng(5)
    rows = [(float(v), int(v % 7 < 3)) for v in rng.integers(0, 40, 2000)]
    df = spark.createDataFrame(rows, "s double, y int")
    a = auc_exact(df.repartition(1), "s", "y")
    b = auc_exact(df.repartition(13), "s", "y")
    assert a == b


def test_soft_labels_rejected(spark, fixture_df):
    """Interior non-0/1 labels (soft labels) must raise even though the
    min/max extremes look like a valid 0/1 range."""
    soft = fixture_df.withColumn(
        "label",
        F.when(F.col("id") % 5 == 0, 0.5).otherwise(F.col("label")),
    )
    with pytest.raises(ValueError, match="must be 0/1"):
        LogisticQualityModel.fit(soft, ["u0"], "label")


def test_auc_rejects_non_binary_labels(spark):
    ship_package(spark)
    two = spark.createDataFrame(
        [(float(i), (i % 3)) for i in range(60)], "s double, y int"
    )
    with pytest.raises(ValueError, match="must be 0/1"):
        auc_exact(two, "s", "y")
    soft = spark.createDataFrame(
        [(float(i), 0.5 if i % 4 == 0 else float(i % 2)) for i in range(60)],
        "s double, y double",
    )
    with pytest.raises(ValueError, match="must be 0/1"):
        auc_exact(soft, "s", "y")


def test_model_shape_mismatch_refused():
    with pytest.raises(ValueError, match="inconsistent model"):
        LogisticQualityModel(
            ["a", "b"], np.zeros(2), np.ones(2), np.zeros(3), 0.0, []
        )
    # a blob whose name section lost a name must refuse, not truncate
    m = LogisticQualityModel(
        ["a", "b"], np.zeros(2), np.ones(2), np.zeros(2), 0.0, []
    )
    blob = bytearray(m.to_bytes())
    # shrink the names payload: "a\x00b" -> "a" (adjust declared length)
    import struct as _struct

    d, nlen, bias = _struct.unpack_from("<IId", blob, 4)
    off = 4 + _struct.calcsize("<IId")
    new = blob[:4] + _struct.pack("<IId", d, 1, bias) + blob[off:off + 1] \
        + blob[off + nlen:]
    with pytest.raises(ValueError, match="inconsistent model"):
        LogisticQualityModel.from_bytes(bytes(new))


# -- grouped per-key training -------------------------------------------------

from recsplit_spark.pipeline.classifier import fit_by_key


@pytest.fixture(scope="module")
def grouped_df(spark, fixture_df):
    """Three groups with DIFFERENT generating rules (per-source quality
    models), plus one one-class group and one constant-feature group."""
    g = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(3))
    df = fixture_df.withColumn("src", F.concat(F.lit("s"), g))
    # per-group rule: group k flips the sign of u1's weight parity-wise
    eta = (
        F.lit(-0.25)
        + F.lit(2.0) * F.col("u0")
        + F.when(F.col("src") == "s1", F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.col("u1")
        + F.lit(0.5) * F.col("u2")
    )
    return df.withColumn("label", (eta > 0).cast("int")).cache()


def test_fit_by_key_matches_independent_fits(grouped_df):
    models, skipped = fit_by_key(
        grouped_df, ["u0", "u1", "u2"], "label", ["src"], ridge=1e-3
    )
    assert skipped == {}
    assert set(models) == {("s0",), ("s1",), ("s2",)}
    for key, m in models.items():
        solo = LogisticQualityModel.fit(
            grouped_df.filter(F.col("src") == key[0]),
            ["u0", "u1", "u2"], "label", ridge=1e-3,
        )
        assert np.allclose(m.weights, solo.weights, rtol=1e-5, atol=1e-7), key
        assert m.bias == pytest.approx(solo.bias, rel=1e-5)
        assert np.allclose(m.mu, solo.mu) and np.allclose(m.sd, solo.sd)
        h = m.loss_history
        assert all(b <= a + 1e-12 for a, b in zip(h, h[1:])), (key, h)
    # the s1 model must have learned the FLIPPED u1 sign
    assert models[("s1",)].weights[1] > 0 > models[("s0",)].weights[1]


def test_fit_by_key_skips_unfittable_groups(spark, grouped_df):
    df = grouped_df.withColumn(
        "label",
        F.when(F.col("src") == "s2", F.lit(1)).otherwise(F.col("label")),
    ).withColumn(
        "u2",
        F.when(F.col("src") == "s0", F.lit(3.0)).otherwise(F.col("u2")),
    )
    models, skipped = fit_by_key(
        df, ["u0", "u1", "u2"], "label", ["src"], ridge=1e-3
    )
    assert skipped == {("s2",): "one class",
                      ("s0",): "constant feature u2"}
    assert set(models) == {("s1",)}


def test_fit_by_key_validation(spark, grouped_df):
    soft = grouped_df.withColumn(
        "label",
        F.when(F.col("id") % 11 == 0, 0.5).otherwise(F.col("label")),
    )
    with pytest.raises(ValueError, match="must be 0/1"):
        fit_by_key(soft, ["u0"], "label", ["src"])
    with pytest.raises(ValueError, match="max_groups"):
        fit_by_key(
            grouped_df.withColumn("src", F.col("id")),
            ["u0"], "label", ["src"], max_groups=100,
        )


def test_fit_by_key_pending_final_scan_and_empty_input(spark, grouped_df):
    """max_iter=1 exits right after an optimistic step: the final
    loss-only scan must verify it and the history must hold TRUE losses
    (monotone from log 2). All-null input raises like fit()."""
    import math

    models, _ = fit_by_key(
        grouped_df, ["u0", "u1", "u2"], "label", ["src"],
        ridge=1e-3, max_iter=1,
    )
    for key, m in models.items():
        h = m.loss_history
        assert h[0] == pytest.approx(math.log(2.0))
        assert len(h) == 2 and h[1] <= h[0], (key, h)
    empty = grouped_df.withColumn("label", F.lit(None).cast("int"))
    with pytest.raises(ValueError, match="no non-null rows"):
        fit_by_key(empty, ["u0"], "label", ["src"])


def test_fit_by_key_python_str_key_forms(spark):
    """Model keys use PYTHON-str forms ('True', not Spark CAST 'true') —
    the per-key sketch-table convention, so the two per-key surfaces
    stay join-compatible on bool/float group columns."""
    ship_package(spark)
    df = spark.range(2000).select(
        (F.col("id") % 2 == 0).alias("grp"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(1 << 20))
         / F.lit(float(1 << 20))).alias("x"),
    ).withColumn("label", (F.col("x") > 0.5).cast("int"))
    models, skipped = fit_by_key(df, ["x"], "label", ["grp"], ridge=1e-3)
    assert set(models) == {("True",), ("False",)}, (set(models), skipped)
