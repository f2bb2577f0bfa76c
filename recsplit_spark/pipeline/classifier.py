"""Learned quality classifier — logistic regression over engine-computed
feature columns (the CCNet / GPT-3-appendix-A shape: a tiny linear model
over cheap per-doc statistics, scored corpus-wide to pick training data).

Training is distributed Newton/IRLS: each iteration is ONE scan
computing per-partition partials (X^T W X, X^T (y - p), loss) via
``mapInArrow``; the driver collects P tiny flattened rows and only ever
holds the (d+1)x(d+1) normal matrix it must solve anyway — the same
driver-residency argument as IVF centroids (``ann.IVFIndex``) and the
DSIR log-ratio table. Scoring is a PURE Column expression (standardize
-> dot -> sigmoid), zero Python in the hot path, so a fitted model
scores any corpus size at scan speed and composes with the
Gopher/C4/repetition filters on the same scan.

No reference analogue (minperf has no learned components); IRLS is
from scratch (Hastie/Tibshirani/Friedman, ESL §4.4).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_QLR_MAGIC = b"QLR1"


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # numerically stable both tails
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _log1pexp(x: np.ndarray) -> np.ndarray:
    """log(1 + exp(x)) without overflow (loss kernel)."""
    out = np.empty_like(x)
    big = x > 30
    out[big] = x[big]
    out[~big] = np.log1p(np.exp(x[~big]))
    return out


def _check_numeric(df, cols: list[str]) -> None:
    from pyspark.sql.types import NumericType

    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, NumericType):
            raise ValueError(
                f"feature/label column {c!r} must be numeric, got "
                f"{dt.simpleString()}"
            )


class LogisticQualityModel:
    """Fitted logistic model over standardized features.

    Attributes: ``feature_cols`` (order matters), ``mu``/``sd`` (float64
    standardization constants, part of the model), ``weights`` (per
    standardized feature), ``bias``, ``loss_history`` (mean log-loss per
    Newton iteration, first entry = the w=0 starting loss).
    """

    def __init__(self, feature_cols: list[str], mu: np.ndarray,
                 sd: np.ndarray, weights: np.ndarray, bias: float,
                 loss_history: list[float]) -> None:
        self.feature_cols = list(feature_cols)
        self.mu = np.asarray(mu, dtype=np.float64)
        self.sd = np.asarray(sd, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.loss_history = list(loss_history)
        lens = {len(self.feature_cols), len(self.mu), len(self.sd),
                len(self.weights)}
        if len(lens) != 1:
            # refuse, don't adapt: a silent zip-truncation in score_expr
            # would drop trailing weights with no error
            raise ValueError(
                "inconsistent model: "
                f"{len(self.feature_cols)} names, {len(self.mu)} mu, "
                f"{len(self.sd)} sd, {len(self.weights)} weights"
            )

    # -- training ---------------------------------------------------------------
    @classmethod
    def fit(cls, df, feature_cols: list[str], label_col: str, *,
            max_iter: int = 25, tol: float = 1e-8, ridge: float = 1e-6,
            ) -> "LogisticQualityModel":
        """Distributed Newton/IRLS fit. ``label_col`` must be 0/1
        (validated in the standardization scan); rows with any null
        feature/label are dropped. ``ridge`` (L2 on the standardized
        weights, not the bias) keeps separable data finite and the
        Hessian invertible. Cost: 1 standardization scan + one scan per
        Newton iteration (typically 6-10) + one per step-halving (rare).
        """
        import pyspark.sql.functions as F

        feature_cols = list(feature_cols)
        if not feature_cols:
            raise ValueError("need at least one feature column")
        _check_numeric(df, feature_cols + [label_col])
        base = df.select(
            *[F.col(c).cast("double") for c in feature_cols],
            F.col(label_col).cast("double").alias("__y"),
        ).dropna()

        # one exact JVM scan: n, mean/std per feature, label validation.
        # The bad-label COUNT (not just min/max) catches interior
        # non-0/1 values like a soft-label 0.5 whose extremes look fine.
        aggs = [F.count("*").alias("__n"),
                F.sum((~F.col("__y").isin(0.0, 1.0)).cast("long"))
                .alias("__ybad"),
                F.sum("__y").alias("__ysum")]
        for c in feature_cols:
            aggs += [F.avg(c).alias(f"__mu_{c}"),
                     F.stddev_pop(c).alias(f"__sd_{c}")]
        row = base.agg(*aggs).collect()[0]
        n = int(row["__n"])
        if n == 0:
            raise ValueError("no non-null rows to fit on")
        if int(row["__ybad"]) != 0:
            raise ValueError(
                f"label {label_col!r} must be 0/1; "
                f"{int(row['__ybad'])} rows hold other values"
            )
        if row["__ysum"] in (0, n):
            raise ValueError("labels are all one class — nothing to fit")
        mu = np.array([row[f"__mu_{c}"] for c in feature_cols])
        sd = np.array([row[f"__sd_{c}"] for c in feature_cols])
        # relative epsilon: Spark's grouped variance returns ~1e-16, not
        # exact 0, for a constant column
        flat_mask = sd <= 1e-12 * np.maximum(1.0, np.abs(mu))
        if np.any(flat_mask):
            flat = [c for c, f in zip(feature_cols, flat_mask) if f]
            raise ValueError(f"constant feature column(s): {flat}")

        d = len(feature_cols)
        mu_b, sd_b = mu.copy(), sd.copy()

        def _partials(w_full: np.ndarray, hessian: bool):
            """One scan -> summed (H, g, loss, n) under weights w_full
            ([bias, w_1..w_d] in standardized space)."""
            wb = w_full.copy()

            def _scan(batches):
                H = np.zeros((d + 1, d + 1)) if hessian else None
                g = np.zeros(d + 1)
                loss = 0.0
                cnt = 0
                for batch in batches:
                    cols = [
                        batch.column(i).to_numpy(zero_copy_only=False)
                        for i in range(d)
                    ]
                    y = batch.column(d).to_numpy(zero_copy_only=False)
                    Z = np.empty((len(y), d + 1))
                    Z[:, 0] = 1.0
                    for i in range(d):
                        Z[:, i + 1] = (cols[i] - mu_b[i]) / sd_b[i]
                    eta = Z @ wb
                    p = _sigmoid(eta)
                    # log-loss: log(1+exp(eta)) - y*eta, stable
                    loss += float(np.sum(_log1pexp(eta) - y * eta))
                    cnt += len(y)
                    if hessian:
                        g += Z.T @ (y - p)
                        W = p * (1.0 - p)
                        H += (Z * W[:, None]).T @ Z
                    else:
                        g += Z.T @ (y - p)
                out = {
                    "g": pa.array([g.tolist()]),
                    "loss": pa.array([loss]),
                    "n": pa.array([cnt], type=pa.int64()),
                }
                if hessian:
                    out = {"h": pa.array([H.ravel().tolist()]), **out}
                yield pa.record_batch(
                    list(out.values()), names=list(out.keys())
                )

            schema = ("h array<double>, " if hessian else "") + \
                "g array<double>, loss double, n bigint"
            rows = base.mapInArrow(_scan, schema=schema).collect()
            g = np.sum([np.array(r["g"]) for r in rows], axis=0)
            loss = float(sum(r["loss"] for r in rows))
            cnt = int(sum(r["n"] for r in rows))
            H = (
                np.sum([np.array(r["h"]) for r in rows], axis=0)
                .reshape(d + 1, d + 1)
                if hessian else None
            )
            return H, g, loss, cnt

        import math

        def _tol(ref: float) -> float:
            return 1e-12 * max(1.0, abs(ref))

        # Scan economy: loss at w=0 is EXACTLY n*log 2 (eta = 0 for
        # every row), so no seeding scan; each Newton step is accepted
        # optimistically and VERIFIED by the next iteration's Hessian
        # scan (which computes the loss anyway) — one scan per
        # iteration, with loss-only backtracking probes only when a
        # step actually overshot (rare), plus at most one final
        # verification scan. history holds the TRUE loss of every
        # accepted iterate.
        D = np.diag([0.0] + [1.0] * d)
        w = np.zeros(d + 1)
        w_prev = None
        loss_acc = n * math.log(2.0)
        history = [math.log(2.0)]
        reg = np.zeros(d + 1)
        cnt = n
        pending = False  # last step accepted but not yet loss-verified
        it = 0
        while it < max_iter:
            H, g, loss_w, cnt = _partials(w, hessian=True)
            if pending and loss_w > loss_acc + _tol(loss_acc):
                # overshoot: roll back and halve with loss-only probes,
                # recording the loss of the point ACTUALLY accepted
                step = w - w_prev
                lw = loss_w
                for _halve in range(6):
                    step *= 0.5
                    _, _, lw, _ = _partials(w_prev + step, hessian=False)
                    if lw <= loss_acc + _tol(loss_acc):
                        break
                w = w_prev + step
                loss_acc = lw
                history[-1] = lw / cnt
                pending = False
                continue  # redo the Hessian at the repaired point
            history[-1] = loss_w / cnt
            loss_acc = loss_w
            pending = False
            it += 1
            reg[1:] = ridge * w[1:]
            step = np.linalg.solve(H + cnt * ridge * D, g - cnt * reg)
            if np.max(np.abs(step)) < tol:
                break
            w_prev, w = w, w + step
            history.append(history[-1])  # placeholder until verified
            pending = True
        if pending:
            # max_iter exhausted right after an unverified step: verify
            # it with one loss scan; on overshoot keep the previous
            # (verified) iterate rather than an unprobed point
            _, _, lf, cnt2 = _partials(w, hessian=False)
            if lf > loss_acc + _tol(loss_acc):
                w = w_prev
                history.pop()
            else:
                history[-1] = lf / cnt2
        return cls(feature_cols, mu, sd, w[1:], w[0], history)

    # -- scoring ----------------------------------------------------------------
    def score_expr(self):
        """P(quality=1) as a pure Column expression — no UDF, no
        shuffle; Catalyst keeps it inside whole-stage codegen."""
        import pyspark.sql.functions as F

        eta = F.lit(self.bias)
        for c, w, m, s in zip(self.feature_cols, self.weights,
                              self.mu, self.sd):
            eta = eta + F.lit(float(w)) * (
                (F.col(c).cast("double") - F.lit(float(m))) / F.lit(float(s))
            )
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))

    def with_score(self, df, out_col: str = "quality_score"):
        return df.withColumn(out_col, self.score_expr())

    def score_array(self, X: np.ndarray) -> np.ndarray:
        """Driver-side reference scorer over an (n, d) float matrix —
        the kernel tests pin the Column expression against this."""
        Z = (np.asarray(X, dtype=np.float64) - self.mu) / self.sd
        return _sigmoid(self.bias + Z @ self.weights)

    # -- serialization ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        names = "\x00".join(self.feature_cols).encode("utf-8")
        return (
            _QLR_MAGIC
            + struct.pack("<IId", len(self.feature_cols), len(names),
                          self.bias)
            + names
            + self.mu.astype("<f8").tobytes()
            + self.sd.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "LogisticQualityModel":
        if data[:4] != _QLR_MAGIC:
            raise ValueError("bad quality-model header")
        d, nlen, bias = struct.unpack_from("<IId", data, 4)
        off = 4 + struct.calcsize("<IId")
        names = data[off:off + nlen].decode("utf-8").split("\x00")
        off += nlen
        mu = np.frombuffer(data, dtype="<f8", count=d, offset=off).copy()
        off += 8 * d
        sd = np.frombuffer(data, dtype="<f8", count=d, offset=off).copy()
        off += 8 * d
        w = np.frombuffer(data, dtype="<f8", count=d, offset=off).copy()
        return cls(names, mu, sd, w, bias, [])


# ---------------------------------------------------------------------------
# exact ranking evaluation — distributed ROC AUC
# ---------------------------------------------------------------------------

def auc_exact(df, score_col: str, label_col: str) -> dict:
    """Exact ROC AUC (Mann-Whitney U with average-rank tie handling)
    over any score/0-1-label pair, as a RATIONAL number:
    ``auc = numer2 / (2 * n_pos * n_neg)`` with ``numer2`` =
    sum over score groups of ``pos_at * (2*neg_strictly_below +
    neg_at)`` — an integer, so two engines computing it independently
    must agree bit-for-bit (no float-order ambiguity; the oracle
    recomputes it with SQL window functions).

    Distributed shape — the classic two-level prefix sum, NEVER a
    single-partition global window: (1) groupBy(score) partial counts
    (one shuffle, |distinct scores| rows); (2) range partition + local
    sort of the GROUP rows; (3) per-partition negative totals collected
    (P tiny rows) -> broadcast prefix offsets; (4) one mapInPandas pass
    emits a per-partition partial numerator. Accumulation switches to
    Python ints when ``2 * n_pos * n_neg`` approaches int64 (the CMS
    inner-product precedent); exact at any scale.

    Returns ``{"auc", "numer2", "n_pos", "n_neg"}``. Raises if either
    class is absent.
    """
    import pandas as pd
    import pyspark.sql.functions as F

    _check_numeric(df, [score_col, label_col])
    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("double").alias("__y"),
    ).dropna()
    # validate BEFORE casting to long: a 0.5 soft label truncates to 0
    # silently, and a label of 2 makes per-group neg_at negative —
    # both would return a garbage "AUC" with no error
    n_bad = base.agg(
        F.sum((~F.col("__y").isin(0.0, 1.0)).cast("long"))
    ).collect()[0][0]
    if n_bad:
        raise ValueError(
            f"label {label_col!r} must be 0/1; {int(n_bad)} rows hold "
            "other values"
        )
    base = base.withColumn("__y", F.col("__y").cast("long"))
    g = base.groupBy("__s").agg(
        F.sum("__y").alias("pos_at"),
        (F.count("*") - F.sum("__y")).alias("neg_at"),
    )
    spark = df.sparkSession
    p = max(2, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2)
    g2 = (
        g.repartitionByRange(p, "__s")
        .sortWithinPartitions("__s")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        parts = {
            int(r["pid"]): (int(r["neg"]), int(r["pos"]))
            for r in g2.groupBy("pid")
            .agg(F.sum("neg_at").alias("neg"), F.sum("pos_at").alias("pos"))
            .collect()
        }
        n_neg = sum(v[0] for v in parts.values())
        n_pos = sum(v[1] for v in parts.values())
        if n_pos == 0 or n_neg == 0:
            raise ValueError(
                f"AUC needs both classes; n_pos={n_pos}, n_neg={n_neg}"
            )
        # strictly-below-negatives offset per range partition
        offsets, acc = {}, 0
        for pid in sorted(parts):
            offsets[pid] = acc
            acc += parts[pid][0]
        # int64 is safe iff every addend and the total fit comfortably
        use_int64 = 2 * n_pos * n_neg < 2**62

        def _numer(batches):
            tot = 0
            last_pid = None
            cum = 0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["pid"].iloc[0])
                if pid != last_pid:
                    cum = offsets[pid]
                    last_pid = pid
                pos_at = pdf["pos_at"].to_numpy()
                neg_at = pdf["neg_at"].to_numpy()
                below = cum + np.concatenate(([0], np.cumsum(neg_at)[:-1]))
                cum = int(below[-1] + neg_at[-1])
                if use_int64:
                    tot += int(np.sum(pos_at * (2 * below + neg_at)))
                else:
                    tot += sum(
                        int(pa_) * (2 * int(b_) + int(na_))
                        for pa_, b_, na_ in zip(pos_at, below, neg_at)
                    )
            yield pd.DataFrame({"numer2": [str(tot)]})

        numer2 = sum(
            int(r["numer2"])
            for r in g2.mapInPandas(_numer, schema="numer2 string").collect()
        )
    finally:
        g2.unpersist()
    return {
        "auc": numer2 / (2 * n_pos * n_neg),
        "numer2": numer2,
        "n_pos": n_pos,
        "n_neg": n_neg,
    }


def fit_by_key(df, feature_cols: list[str], label_col: str,
               group_cols: list[str], *, max_iter: int = 25,
               tol: float = 1e-8, ridge: float = 1e-6,
               max_groups: int = 10_000):
    """One logistic model PER GROUP (e.g. a quality model per source)
    with the same scan economy as ``LogisticQualityModel.fit``: every
    Newton iteration is ONE ``mapInPandas`` scan computing
    per-(partition x group) partials for ALL groups at once; the driver
    folds G normal matrices and solves G (d+1)-sized systems (the
    ``profile_by_key`` shape — G x P tiny partial rows move, never
    data). Steps are accepted optimistically and verified by the NEXT
    iteration's scan; on overshoot a group's step halves (verified next
    scan, at most 6 halvings before the point is accepted as-is, like
    ``fit``'s probe cap — a stuck group therefore costs at most ~6
    extra scans, never the whole budget), and one final loss-only scan
    settles any still-pending step (rolling back on overshoot, exactly
    like ``fit``). ``max_iter`` bounds the TOTAL scan count.

    Returns ``(models, skipped)``: ``models`` maps the group-key tuple
    (PYTHON-str forms of the group values — the same key convention as
    the per-key sketch state tables, see the working notes on
    CAST-vs-str divergence for bool/float keys) to a fitted
    ``LogisticQualityModel``; ``skipped`` maps unfittable groups to a
    reason (``"one class"`` / ``"constant feature <c>"``). Rows with a
    null feature, label, or group value are dropped; non-0/1 labels
    raise. The G x P partial collect bounds this to ``max_groups``
    groups (a per-SOURCE quality model is tens of groups; for more,
    shard the input by group range).
    """
    import math

    import pandas as pd
    import pyspark.sql.functions as F

    feature_cols = list(feature_cols)
    group_cols = list(group_cols)
    if not feature_cols or not group_cols:
        raise ValueError("need at least one feature and one group column")
    _check_numeric(df, feature_cols + [label_col])
    d = len(feature_cols)
    base = df.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(group_cols)],
        *[F.col(c).cast("double").alias(f"__f_{i}")
          for i, c in enumerate(feature_cols)],
        F.col(label_col).cast("double").alias("__y"),
    ).dropna()
    kcols = [f"__k_{i}" for i in range(len(group_cols))]
    fcols = [f"__f_{i}" for i in range(d)]

    aggs = [F.count("*").alias("__n"),
            F.sum((~F.col("__y").isin(0.0, 1.0)).cast("long"))
            .alias("__ybad"),
            F.sum("__y").alias("__ysum")]
    for c in fcols:
        aggs += [F.avg(c).alias(f"__mu_{c}"),
                 F.stddev_pop(c).alias(f"__sd_{c}")]
    stats = base.groupBy(*kcols).agg(*aggs).collect()
    if not stats:
        raise ValueError("no non-null rows to fit on")
    if len(stats) > max_groups:
        raise ValueError(
            f"{len(stats)} groups exceed max_groups={max_groups} — the "
            "G x P partial collect would be data-sized; shard by group"
        )
    bad = {tuple(str(r[k]) for k in kcols): int(r["__ybad"])
           for r in stats if int(r["__ybad"])}
    if bad:
        raise ValueError(
            f"label {label_col!r} must be 0/1; bad rows per group: {bad}"
        )

    skipped: dict[tuple, str] = {}
    state: dict[tuple, dict] = {}
    for r in stats:
        key = tuple(str(r[k]) for k in kcols)
        n_g = int(r["__n"])
        if r["__ysum"] in (0, n_g):
            skipped[key] = "one class"
            continue
        mu = np.array([r[f"__mu_{c}"] for c in fcols])
        sd = np.array([r[f"__sd_{c}"] for c in fcols])
        # same relative epsilon as fit(): grouped variance of a constant
        # comes back ~1e-16, not exact 0
        flat_mask = sd <= 1e-12 * np.maximum(1.0, np.abs(mu))
        if np.any(flat_mask):
            flat = [c for c, f in zip(feature_cols, flat_mask) if f]
            skipped[key] = f"constant feature {', '.join(flat)}"
            continue
        state[key] = {
            "mu": mu, "sd": sd, "n": n_g,
            "w": np.zeros(d + 1), "w_prev": None,
            "loss_acc": n_g * math.log(2.0),
            "history": [math.log(2.0)],
            "pending": False, "done": False, "halves": 0,
        }

    def _tolr(ref: float) -> float:
        return 1e-12 * max(1.0, abs(ref))

    out_schema = (
        ", ".join(f"{k} string" for k in kcols)
        + ", h array<double>, g array<double>, loss double, n bigint"
    )

    def _scan_partials(params: dict, hessian: bool):
        """One scan -> per-group folded (H, g, loss, n). ``params`` maps
        group key -> (mu, sd, w)."""

        def _kernel(batches):
            acc: dict[tuple, list] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for key, sub in pdf.groupby(kcols, sort=False):
                    if not isinstance(key, tuple):
                        key = (key,)
                    key = tuple(str(v) for v in key)
                    p = params.get(key)
                    if p is None:
                        continue
                    mu, sd, wv = p
                    y = sub["__y"].to_numpy()
                    Z = np.empty((len(y), d + 1))
                    Z[:, 0] = 1.0
                    for i, c in enumerate(fcols):
                        Z[:, i + 1] = (sub[c].to_numpy() - mu[i]) / sd[i]
                    eta = Z @ wv
                    pr = _sigmoid(eta)
                    a = acc.setdefault(
                        key,
                        [np.zeros((d + 1, d + 1)), np.zeros(d + 1), 0.0, 0],
                    )
                    a[2] += float(np.sum(_log1pexp(eta) - y * eta))
                    a[3] += len(y)
                    a[1] += Z.T @ (y - pr)
                    if hessian:
                        W = pr * (1.0 - pr)
                        a[0] += (Z * W[:, None]).T @ Z
            rows = {
                **{k: [] for k in kcols}, "h": [], "g": [],
                "loss": [], "n": [],
            }
            for key, (H, g, loss, cnt) in acc.items():
                for kc, kv in zip(kcols, key):
                    rows[kc].append(kv)
                rows["h"].append(H.ravel().tolist() if hessian else [])
                rows["g"].append(g.tolist())
                rows["loss"].append(loss)
                rows["n"].append(cnt)
            yield pd.DataFrame(rows)

        folded: dict[tuple, list] = {}
        for r in base.mapInPandas(_kernel, schema=out_schema).collect():
            key = tuple(r[k] for k in kcols)
            f = folded.setdefault(
                key, [np.zeros((d + 1) * (d + 1)), np.zeros(d + 1), 0.0, 0]
            )
            if hessian:
                f[0] += np.array(r["h"])
            f[1] += np.array(r["g"])
            f[2] += float(r["loss"])
            f[3] += int(r["n"])
        return {
            k: ((v[0].reshape(d + 1, d + 1) if hessian else None),
                v[1], v[2], v[3])
            for k, v in folded.items()
        }

    D = np.diag([0.0] + [1.0] * d)
    it = 0
    while it < max_iter and any(not s["done"] for s in state.values()):
        params = {
            k: (s["mu"], s["sd"], s["w"])
            for k, s in state.items() if not s["done"]
        }
        parts = _scan_partials(params, hessian=True)
        it += 1
        for key, s in state.items():
            if s["done"] or key not in parts:
                continue
            H, g, loss_w, cnt = parts[key]
            if (s["pending"] and s["halves"] < 6
                    and loss_w > s["loss_acc"] + _tolr(s["loss_acc"])):
                # overshoot: halve the last step; the NEXT scan verifies.
                # After 6 halvings the point is accepted as-is with its
                # TRUE loss recorded (fit()'s probe-cap behavior) so one
                # pathological group cannot consume the whole budget.
                s["w"] = s["w_prev"] + (s["w"] - s["w_prev"]) * 0.5
                s["halves"] += 1
                continue
            s["history"][-1] = loss_w / cnt
            s["loss_acc"] = loss_w
            s["pending"] = False
            s["halves"] = 0
            reg = np.zeros(d + 1)
            reg[1:] = ridge * s["w"][1:]
            step = np.linalg.solve(H + cnt * ridge * D, g - cnt * reg)
            if np.max(np.abs(step)) < tol:
                s["done"] = True
                continue
            s["w_prev"], s["w"] = s["w"], s["w"] + step
            s["history"].append(s["history"][-1])
            s["pending"] = True
    still = {
        k: (s["mu"], s["sd"], s["w"])
        for k, s in state.items() if s["pending"]
    }
    if still:
        parts = _scan_partials(still, hessian=False)
        for key, s in state.items():
            if not s["pending"] or key not in parts:
                continue
            _, _, lf, cnt = parts[key]
            if lf > s["loss_acc"] + _tolr(s["loss_acc"]):
                s["w"] = s["w_prev"]
                s["history"].pop()
            else:
                s["history"][-1] = lf / cnt
    models = {
        k: LogisticQualityModel(
            feature_cols, s["mu"], s["sd"], s["w"][1:], s["w"][0],
            s["history"],
        )
        for k, s in state.items()
    }
    return models, skipped
