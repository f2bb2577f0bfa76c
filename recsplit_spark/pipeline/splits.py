"""Deterministic train/val/test splits over a key column.

The assignment is a pure Column expression — no shuffle, no sampling
state, no Python: ``u = int(first 12 hex chars of md5(salt ':' id))``
(a uniform 48-bit integer) compared against integer cut points
``floor(cum_fraction * 2^48)``. Properties that matter for a training
corpus at 10^12 docs:

- **Partition- and cluster-independent**: the label depends only on the
  key bytes, so any engine anywhere reproduces it (the driver-contract
  oracle recomputes the split value-for-value in DuckDB from the same
  md5 arithmetic — the reason for md5 over xxhash64 here: it is the one
  keyed hash both engines expose identically).
- **Monotone-stable**: labels are ordered slices of the same uniform u,
  so growing an earlier split's fraction only ever MOVES rows from later
  splits into it — a doc never silently swaps between two untouched
  splits when fractions are re-tuned (the test-set-contamination
  failure mode of re-sampling).
- **Stratified in expectation**: u is independent of every feature, so
  per-stratum proportions hold to ~1/sqrt(stratum size) without any
  per-stratum pass. Exact per-stratum counts would need a global rank
  per stratum (a sort at corpus scale) for a guarantee the law of large
  numbers already prices in at 10^12.

The salt namespaces assignments: two pipelines with different salts draw
independent splits over the same keys.
"""

from __future__ import annotations

#: u is the first 12 md5 hex chars = 48 bits: big enough that the
#: largest fraction granularity anyone asks for (1e-6) still spans
#: ~2.8e8 distinct u values; small enough to be exact in an int64 in
#: every SQL engine (16 hex chars would overflow signed 64-bit)
_U_BITS = 48
_U_SPAN = 1 << _U_BITS


def split_cuts(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """[(name, upper_cut_exclusive)] with cuts = floor(cum_frac * 2^48),
    the integer boundary contract shared with the SQL oracle. The final
    cut is pinned to 2^48 so the labels are exhaustive even when the
    fractions sum to 1 - epsilon in float."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    cuts, cum = [], 0.0
    for name, frac in fractions.items():
        if frac <= 0:
            raise ValueError(f"fraction for {name!r} must be > 0")
        cum += float(frac)
        cuts.append((str(name), int(cum * _U_SPAN)))
    cuts[-1] = (cuts[-1][0], _U_SPAN)
    return cuts


def split_u_expr(id_col: str, salt: str = "split"):
    """The uniform 48-bit integer Column: int(md5(salt ':' id)[:12], 16).
    Exposed so callers (and tests) can pin the exact u of a key."""
    from pyspark.sql import functions as F

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def stratified_split(
    df,
    id_col: str,
    fractions: dict[str, float],
    *,
    salt: str = "split",
    out_col: str = "split",
):
    """Add the split-label column. Insertion order of ``fractions``
    defines the cut order (earlier names own lower u slices — the
    monotone-stability contract above)."""
    from pyspark.sql import functions as F

    cuts = split_cuts(fractions)
    u = split_u_expr(id_col, salt)
    expr = F.lit(cuts[-1][0])
    for name, cut in reversed(cuts[:-1]):
        expr = F.when(u < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def split_leakage(
    df,
    id_col: str,
    col: str,
    split_col: str = "split",
    holdout: tuple = ("val", "test"),
    n: int = 13,
    waves: int = 1,
    method: str = "probe",
):
    """Leakage audit across an assigned split: the NON-holdout rows plus
    ``contam_windows`` / ``contaminated`` marking docs that share any
    verbatim n-token window with a holdout doc — near-verbatim overlap
    is exactly the eval-set leakage a split by doc id cannot see (the
    same passage pasted into two docs gets two ids and two splits).

    ``method='probe'`` composes the decontamination probe: the holdout
    windows gather to a driver hash-pair set (16 B/window, wave-sliced
    broadcast) and the train side is one zero-shuffle scan. Right when
    the holdout is benchmark-sized — a FIXED eval set, the common case.
    ``method='join'`` is the corpus-scale path for when the holdout is
    a fixed FRACTION of the corpus (a 10% split of 10^12 docs does not
    gather anywhere): both sides emit 24 B/window (id, h1, h2) rows and
    an inner hash-join + per-doc count replaces the probe — one shuffle
    of window hashes, never token arrays. Both methods return identical
    rows (tested). Drop or cut the flagged docs with
    ``decontaminate.decontaminate`` using the same holdout windows."""
    from pyspark.sql import functions as F

    from .decontaminate import benchmark_windows, contamination, window_pairs

    held = df.filter(F.col(split_col).isin(list(holdout)))
    rest = df.filter(~F.col(split_col).isin(list(holdout)))
    if method == "probe":
        bw = benchmark_windows(held, col=col, n=n)
        return contamination(rest, bw, id_col=id_col, col=col, n=n,
                             waves=waves)
    if method != "join":
        raise ValueError(f"method must be 'probe' or 'join' (got {method!r})")
    held_w = window_pairs(held, id_col, col, n).select("h1", "h2").distinct()
    counts = (
        window_pairs(rest, id_col, col, n)
        .join(held_w, ["h1", "h2"], "inner")
        .groupBy("__id")
        .agg(F.count("*").alias("__c"))
    )
    joined = rest.join(
        counts.withColumnRenamed("__id", id_col), id_col, "left"
    )
    return (
        joined.withColumn(
            "contam_windows", F.coalesce(F.col("__c"), F.lit(0)).cast("int")
        )
        .withColumn("contaminated", F.col("contam_windows") > 0)
        .select(*rest.columns, "contam_windows", "contaminated")
    )
