#!/usr/bin/env python
"""Measure theta / Misra-Gries accuracy at scale (BASELINE.md table rows).

Deterministic inputs (seed-pinned, same convention as the 1e8 runs for
HLL/CMS/KLL): distinct keys from spark.range -> xxhash64; zipf token ranks
for MG. Prints one JSON line per sketch with measured error vs the
published bound.

Usage: python scripts/sketch_accuracy_run.py [--n 100000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from recsplit_spark.session import get_spark, ship_package
    from recsplit_spark.sketches import MisraGries, ThetaSketch

    spark = get_spark(app_name="sketch-accuracy", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    n = args.n

    # -- theta: n distinct keys; two overlapping halves for the set ops ------
    sk = ThetaSketch(k=4096)
    df = spark.range(n).select(F.col("id"))
    t0 = time.time()
    st = sk.build(df, "id")
    theta_wall = time.time() - t0
    est = sk.estimate(st)

    # A = [0, 0.6n), B = [0.4n, n): union n, intersection 0.2n
    a_df = spark.range(0, int(n * 0.6)).select(F.col("id"))
    b_df = spark.range(int(n * 0.4), n).select(F.col("id"))
    sa, sb = sk.build(a_df, "id"), sk.build(b_df, "id")
    inter_est = sk.intersect_estimate(sa, sb)
    union_est = sk.union_estimate(sa, sb)
    print(
        json.dumps(
            {
                "sketch": "theta",
                "k": sk.k,
                "n": n,
                "estimate": est,
                "rel_err": abs(est - n) / n,
                "rse_bound": sk.relative_error,
                "union_est": union_est,
                "union_rel_err": abs(union_est - n) / n,
                "inter_est": inter_est,
                "inter_exact": int(n * 0.2),
                "inter_err_over_union": abs(inter_est - n * 0.2) / n,
                "build_wall_s": round(theta_wall, 1),
                "vals_per_sec": round(n / theta_wall, 1),
            }
        ),
        flush=True,
    )

    # -- MG: skewed head + uniform tail, exact head counts known in closed
    # form. Even ids -> geometric head token h<t>: with y = (id/2) % 2^20,
    # t = min(floor(log2(y+2)), 19) — token h19 carries ~25% of ALL items.
    # Odd ids -> uniform tail u<(id/2) % 1000003>: ~1M distinct tokens at
    # ~n/2e6 count each, forcing constant capacity trims (the regime where
    # the dec certificate is non-trivial).
    mg = MisraGries(k=256)
    y = F.floor(F.col("id") / 2)
    toks = spark.range(n).select(
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("h"),
                F.least(F.floor(F.log2((y % (1 << 20)) + 2)), F.lit(19)).cast(
                    "string"
                ),
            ),
        )
        .otherwise(F.concat(F.lit("u"), (y % 1000003).cast("string")))
        .alias("tok")
    )
    t0 = time.time()
    stm = mg.build(toks, "tok")
    mg_wall = time.time() - t0
    # exact head counts: y ranges over [0, m) with m = #even ids
    m = (n + 1) // 2
    blocks, rem = divmod(m, 1 << 20)

    def exact_count(t: int) -> int:
        if t < 19:
            lo, hi = (1 << t) - 2, (1 << (t + 1)) - 2
        else:
            lo, hi = (1 << 19) - 2, 1 << 20
        return blocks * (hi - lo) + max(0, min(rem, hi) - max(0, lo))

    bound = mg.error_bound(stm)
    worst = 0
    ok = True
    for t in range(1, 20):
        ex = exact_count(t)
        est_c = mg.estimate_count(stm, f"h{t}")
        err = ex - est_c
        worst = max(worst, err)
        if not (0 <= err <= bound) or (ex > bound and est_c == 0):
            ok = False
    print(
        json.dumps(
            {
                "sketch": "mg",
                "k": mg.k,
                "n": n,
                "error_bound": bound,
                "bound_limit_n_over_k1": n // (mg.k + 1),
                "worst_undercount": worst,
                "all_within_certificate": ok,
                "build_wall_s": round(mg_wall, 1),
                "vals_per_sec": round(n / mg_wall, 1),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
