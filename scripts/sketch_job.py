#!/usr/bin/env python
"""spark-submit entry point: mergeable-sketch aggregation over a table column.

Cluster usage (the north-rule deployment shape, sketch side)::

    python scripts/make_pyfiles_zip.py            # -> dist/recsplit_spark.zip
    spark-submit --py-files dist/recsplit_spark.zip \
        scripts/sketch_job.py \
        --input <parquet path or Iceberg table name> \
        --col doc_id --sketch hll \
        [--group-by source] [--state-out /path/state.bin] \
        [--hll-p 14] [--cms-eps 5e-4] [--cms-delta 0.01] [--kll-k 256] \
        [--tdigest-compression 200] [--quantiles 0.5,0.9,0.99]

Prints ONE JSON line: estimates (global or per group) + wall seconds.
``--state-out`` persists the serialized global state — reload and merge it
with later runs (all sketches are commutative monoids), or hand it to
``StreamingSketch(state_path=...)`` to continue incrementally.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or Iceberg table")
    ap.add_argument("--col", required=True)
    ap.add_argument(
        "--sketch",
        required=True,
        choices=["hll", "cms", "kll", "tdigest", "bloom", "theta", "mg"],
    )
    ap.add_argument("--group-by", default=None)
    ap.add_argument(
        "--pairwise",
        default=None,
        metavar="KEY",
        help="theta only: emit union/intersection/jaccard estimates for"
        " every pair of KEY groups instead of a global estimate",
    )
    ap.add_argument("--state-out", default=None)
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="waved resumable build: per-wave states+lineage committed here;"
        " re-running with the same path resumes after a crash",
    )
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--cms-eps", type=float, default=5e-4)
    ap.add_argument("--cms-delta", type=float, default=0.01)
    ap.add_argument("--kll-k", type=int, default=256)
    ap.add_argument("--tdigest-compression", type=float, default=200)
    ap.add_argument("--bloom-n", type=int, default=1_000_000)
    ap.add_argument("--bloom-fpr", type=float, default=0.01)
    ap.add_argument(
        "--quantiles",
        default=None,
        help="kll/tdigest global mode only (default 0.5,0.9,0.99); the "
        "per-group path reports each group's single 'estimate'",
    )
    ap.add_argument("--theta-k", type=int, default=4096)
    ap.add_argument("--mg-k", type=int, default=1024)
    ap.add_argument("--top", type=int, default=20, help="mg: top items to print")
    ap.add_argument(
        "--pairwise-out",
        default=None,
        help="write --pairwise rows to this parquet dir instead of the JSON"
        " line (the many-groups scale path: 10^4 groups = 50M pair rows)",
    )
    ap.add_argument(
        "--ngram",
        type=int,
        default=None,
        metavar="N",
        help="feed ALL N-token window hashes of an array<int> --col instead"
        " of the scalar value (hash-input sketches only; mg items become"
        " gram hashes — resolve them with sketches.heavy_ngrams)",
    )
    args = ap.parse_args()

    # preflight: flags that only the global path honors must not be
    # silently ignored — the operator planning a later merge via
    # StreamingSketch(state_path=...) would find nothing there
    if (args.group_by or args.pairwise) and args.state_out:
        raise SystemExit(
            "--state-out is global-mode only (per-group states: use "
            "sketches states_by_key / the incremental profile)"
        )
    if (args.group_by or args.pairwise) and args.checkpoint:
        raise SystemExit(
            "--checkpoint is global-mode only (resumable per-key "
            "builds: sketches.CheckpointedBuild per key set, or the "
            "incremental profile)"
        )
    if args.quantiles is not None and (args.group_by or args.pairwise):
        raise SystemExit(
            "--quantiles is global-mode only (the per-group path "
            "reports one 'estimate' per group)"
        )

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("recsplit-sketch").getOrCreate()
    from recsplit_spark.sketches import (
        KLL,
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        MisraGries,
        TDigest,
        ThetaSketch,
    )

    from recsplit_spark.io import read_input

    df = read_input(spark, args.input)

    sk = {
        "hll": lambda: HyperLogLog(p=args.hll_p),
        "cms": lambda: CountMinSketch(eps=args.cms_eps, delta=args.cms_delta),
        "kll": lambda: KLL(k=args.kll_k),
        "tdigest": lambda: TDigest(compression=args.tdigest_compression),
        "bloom": lambda: BloomFilter(n_expected=args.bloom_n, fpr=args.bloom_fpr),
        "theta": lambda: ThetaSketch(k=args.theta_k),
        "mg": lambda: MisraGries(k=args.mg_k),
    }[args.sketch]()

    qs = [
        float(q)
        for q in (args.quantiles or "0.5,0.9,0.99").split(",")
        if q
    ]
    t0 = time.time()
    out: dict = {"sketch": args.sketch, "col": args.col, "input": args.input}
    if args.pairwise:
        if args.sketch != "theta":
            raise SystemExit("--pairwise requires --sketch theta")
        pairs_df = sk.pairwise_set_estimates(
            df, args.col, args.pairwise, ngram=args.ngram
        )
        if args.pairwise_out:
            # many-groups scale path: G(G-1)/2 rows belong in parquet, not
            # in a driver-collected JSON blob (10^4 groups = 50M pairs)
            pairs_df.write.mode("overwrite").parquet(args.pairwise_out)
            out["pairs_out"] = args.pairwise_out
            out["n_pairs"] = spark.read.parquet(args.pairwise_out).count()
        else:
            rows = pairs_df.collect()
            out["pairs"] = [
                {
                    "a": r["key_a"],
                    "b": r["key_b"],
                    "union_est": r["union_est"],
                    "inter_est": r["inter_est"],
                    "jaccard_est": r["jaccard_est"],
                }
                for r in rows
            ]
    elif args.group_by:
        if args.sketch == "mg":
            rows = sk.states_by_key(
                df, args.col, (args.group_by,), ngram=args.ngram
            ).collect()
            out["groups"] = {}
            for r in rows:
                st = sk.from_bytes(bytes(r["state"]))
                out["groups"][r[args.group_by]] = {
                    "top_items": sk.top_items(st, args.top),
                    "error_bound": sk.error_bound(st),
                }
        else:
            rows = sk.aggregate(
                df, args.col, [args.group_by], ngram=args.ngram
            ).collect()
            out["groups"] = {r[args.group_by]: r["estimate"] for r in rows}
    else:
        if args.checkpoint:
            from recsplit_spark.sketches import CheckpointedBuild

            cb = CheckpointedBuild(sk, waves=args.waves)
            state = cb.run(df, args.col, args.checkpoint, ngram=args.ngram)
            out["checkpoint"] = args.checkpoint
            out["waves"] = [
                {
                    "wave": r["wave"],
                    "n_rows": r["n_rows"],
                    "lineage": r["lineage"],
                    "wall_sec": r["wall_sec"],
                }
                for r in cb.metrics(spark, args.checkpoint)
                .orderBy("wave")
                .collect()
            ]
        else:
            state = sk.build(df, args.col, ngram=args.ngram)
        if args.sketch in ("kll", "tdigest"):
            import math

            # empty input -> NaN quantiles; json.dumps would emit bare
            # NaN (invalid JSON) and break the one-JSON-line contract
            qvals = {}
            for q in qs:
                v = float(sk.quantile(state, q))
                qvals[str(q)] = None if math.isnan(v) else v
            out["quantiles"] = qvals
        elif args.sketch == "cms":
            out["total"] = int(sk.total(state))
        elif args.sketch in ("hll", "theta"):
            out["estimate"] = float(sk.estimate(state))
        elif args.sketch == "mg":
            out["top_items"] = sk.top_items(state, args.top)
            out["error_bound"] = sk.error_bound(state)
            out["n_total"] = state.n
        if args.state_out:
            with open(args.state_out, "wb") as f:
                f.write(sk.to_bytes(state))
            out["state_out"] = args.state_out
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
