"""Deterministic corpus mixing: per-group epoch weights -> sampled/
repeated training rows.

The data-mixture step of an LLM pipeline (the per-source "epochs"
table): each group (source/domain/language) gets a weight ``w >= 0``
meaning every document contributes ``floor(w)`` full copies plus one
extra copy with probability ``w - floor(w)``. Downweighting is the
``w < 1`` case (a plain subsample), upsampling is ``w > 1``.

Two selection modes, one decision contract:

- ``exact=False`` (default, the 100 TB shape): the fractional copy is a
  deterministic hash-Bernoulli — ``u = U(xxhash64(seed, key)) < frac``.
  Pure Column filter, ZERO shuffle at any corpus size, and the kept set
  is a pure function of (key values, seed): stable across runs,
  partitionings, and cluster sizes, and NESTED across rates (the kept
  set at a lower rate is a subset of a higher rate's — same ``u``,
  smaller threshold), which makes mixture re-tuning reproducible.
- ``exact=True``: per group, exactly ``floor(frac * n_g + 0.5)`` docs
  get the extra copy — the ``floor(frac * n_g + 0.5)`` smallest by
  ``(u, key)``. Costs one window shuffle on ``group_col``; meant for
  modest group counts / benchmark-exact mixtures, and it is what the
  driver oracle query pins (every output an exact integer).

Copies are materialized with an ``epoch`` column (0..copies-1) so
downstream packing/shuffling treats them as distinct examples.

No reference analogue (minperf is an MPHF library); this is task-brief
surface ("operations a large-scale training-data pipeline would need"),
same bottom-k/hash-contract family as sketches/wsample.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mix_corpus", "weights_for_budgets"]

#: u is built from the top 53 bits of the seed-salted xxhash64 (the
#: float64-exact range), matching the sketch hash contract
#: (xxhash64 over the stringified key, seed as a leading lit column).
_U_BITS = 53


def _u_col(key_col: str, seed: int):
    h = F.xxhash64(F.lit(int(seed)), F.col(key_col).cast("string"))
    return (F.shiftrightunsigned(h, 64 - _U_BITS)).cast("double") / F.lit(
        float(1 << _U_BITS)
    )


def _weight_col(df: DataFrame, weights, group_col: str, default: float):
    """weights as a dict -> literal when-chain (small G); as a
    DataFrame[(group_col, weight)] -> broadcast join (large G)."""
    if isinstance(weights, DataFrame):
        w = weights.select(
            F.col(group_col), F.col("weight").cast("double").alias("_mix_w")
        )
        return df.join(F.broadcast(w), group_col, "left").withColumn(
            "_mix_w", F.coalesce(F.col("_mix_w"), F.lit(float(default)))
        )
    col = F.lit(float(default))
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"mix weight for {k!r} must be >= 0, got {v}")
        col = F.when(F.col(group_col) == F.lit(k), F.lit(float(v))).otherwise(
            col
        )
    return df.withColumn("_mix_w", col)


def mix_corpus(
    df: DataFrame,
    weights,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    exact: bool = False,
    epoch_col: str = "epoch",
    default_weight: float = 0.0,
) -> DataFrame:
    """Sample/repeat ``df`` per the group->epochs ``weights`` table.

    ``weights`` is a ``dict`` (group value -> float epochs) or a
    ``DataFrame[(group_col, weight)]``; groups not listed get
    ``default_weight`` (0.0 = dropped — a mixture definition is total).
    Returns the input columns plus ``epoch_col`` (int, 0-based copy
    index); rows whose group resolves to 0 kept copies disappear.
    """
    if default_weight < 0:
        raise ValueError("default_weight must be >= 0")
    out = _weight_col(df, weights, group_col, default_weight)
    repeats = F.floor(F.col("_mix_w")).cast("int")
    frac = F.col("_mix_w") - F.floor(F.col("_mix_w"))
    if exact:
        # target_g = floor(frac_g * n_g + 0.5) docs per group take the
        # extra copy: the target_g smallest by (u, key). One window
        # shuffle on group_col; count(*) over the same window avoids a
        # second aggregate+join pass.
        wspec = Window.partitionBy(group_col)
        order = Window.partitionBy(group_col).orderBy(
            _u_col(key_col, seed), F.col(key_col)
        )
        out = out.withColumn(
            "_mix_target",
            F.floor(frac * F.count("*").over(wspec) + F.lit(0.5)),
        ).withColumn(
            "_mix_extra",
            (F.row_number().over(order) <= F.col("_mix_target")).cast("int"),
        )
    else:
        out = out.withColumn(
            "_mix_extra", (_u_col(key_col, seed) < frac).cast("int")
        )
    copies = (repeats + F.col("_mix_extra")).alias("_mix_copies")
    exploded = out.select(
        *df.columns,
        F.posexplode(F.array_repeat(F.lit(True), copies)).alias(
            epoch_col, "_mix_one"
        ),
    )
    return exploded.drop("_mix_one")


def weights_for_budgets(
    df: DataFrame,
    budgets: dict,
    group_col: str = "source",
    size_col: str = "n_chars",
) -> dict:
    """Turn per-group SIZE budgets (tokens/chars/bytes — whatever
    ``size_col`` measures) into ``mix_corpus`` epoch weights:
    ``w_g = budget_g / total_g`` (may exceed 1 -> upsampling). One
    aggregate scan; the driver holds G rows. Groups with no rows or a
    zero total are omitted (nothing can be sampled from them)."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(group_col)
        .agg(F.sum(F.col(size_col).cast("double")))
        .collect()
    }
    out = {}
    for g, budget in budgets.items():
        if budget < 0:
            raise ValueError(f"budget for {g!r} must be >= 0, got {budget}")
        total = totals.get(g)
        if total:
            out[g] = float(budget) / float(total)
    return out
