#!/usr/bin/env python
"""spark-submit entry point: incremental per-key sketch state-table
maintenance over an append-only table (sketches/incremental.py).

Cluster usage (the north-rule deployment shape, incremental side)::

    python scripts/make_pyfiles_zip.py            # -> dist/recsplit_spark.zip
    spark-submit --py-files dist/recsplit_spark.zip \
        scripts/incremental_job.py \
        --source <parquet dir of the growing table> \
        --path   <state root (parquet dir: state/ lineage/ manifest/)> \
        --keys source \
        --spec docs=hll:doc_id --spec grams5=hll:tokens:ngram=5 \
        [--estimates] [--hll-p 14] [--cms-eps 5e-4] [--cms-delta 0.01] \
        [--theta-k 4096] [--files f1.parquet,f2.parquet] \
        [--delta-from GEN] [--sample-added-from GEN] [--sample-limit 100] \
        [--forget-files f1.parquet,f2.parquet [--forget-refold]]

Each run folds ONLY the files never folded before (or exactly the
``--files`` list — the Iceberg snapshot-diff integration point) and
merges them into the committed state table. Prints ONE JSON line:
update metrics (generation, new files, rows) + per-key estimates when
``--estimates`` is set. Re-running with nothing new is a no-op.

``--forget-files`` is the right-to-be-forgotten mode (RUNBOOK §3f):
instead of updating, it removes previously-folded files from the
committed table as a new generation — all-CMS profiles subtract the
forgotten files' counters in O(forgotten) (run BEFORE physically
deleting the files); anything else re-folds the survivors.
"""

from __future__ import annotations

import argparse
import json
import time


def _parse_spec(text: str, args) -> "SketchSpec":
    """CLI shim over the library parser (sketches.multi.parse_spec)."""
    from recsplit_spark.sketches.multi import parse_spec

    try:
        return parse_spec(
            text,
            hll_p=args.hll_p,
            cms_eps=args.cms_eps,
            cms_delta=args.cms_delta,
            bloom_n=args.bloom_n,
            bloom_fpr=args.bloom_fpr,
            theta_k=args.theta_k,
            mg_k=args.mg_k,
        )
    except ValueError as e:
        raise SystemExit(f"--spec: {e}") from None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--source", default=None, help="directory of the growing table"
    )
    ap.add_argument(
        "--files",
        default=None,
        help="comma-separated explicit data-file list (Iceberg snapshot"
        " diff hook) instead of diffing --source",
    )
    ap.add_argument("--path", required=True, help="state-table root")
    ap.add_argument("--keys", required=True, help="comma-separated group keys")
    ap.add_argument(
        "--spec",
        action="append",
        required=True,
        metavar="NAME=KIND:COL[:ngram=N]",
        help="sketch spec (repeatable); kinds: hll cms bloom theta mg",
    )
    ap.add_argument(
        "--estimates",
        action="store_true",
        help="also print per-key estimates from the committed table",
    )
    ap.add_argument(
        "--vacuum",
        type=int,
        default=None,
        metavar="KEEP",
        help="after the update, delete superseded state generations,"
        " keeping the committed one plus KEEP-1 predecessors",
    )
    ap.add_argument(
        "--delta-from",
        type=int,
        default=None,
        metavar="GEN",
        help="also print per-key set deltas (old/new/union/added/"
        "jaccard) from GEN to the committed generation for every theta"
        " spec — computed from the persisted states, no rescan",
    )
    ap.add_argument(
        "--sample-added-from",
        type=int,
        default=None,
        metavar="GEN",
        help="also print up to --sample-limit resolved values per theta"
        " spec that the generations after GEN added (uniform sample;"
        " scans only the appended files)",
    )
    ap.add_argument("--sample-limit", type=int, default=100)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--cms-eps", type=float, default=5e-4)
    ap.add_argument("--cms-delta", type=float, default=0.01)
    ap.add_argument("--bloom-n", type=int, default=1_000_000)
    ap.add_argument("--bloom-fpr", type=float, default=0.01)
    ap.add_argument("--theta-k", type=int, default=4096)
    ap.add_argument("--mg-k", type=int, default=1024)
    ap.add_argument(
        "--forget-files",
        default=None,
        help="comma-separated previously-folded files to FORGET (RTBF,"
        " file granularity) instead of updating: removes their"
        " contribution from the committed table as a new generation"
        " (all-CMS profiles subtract in O(forgotten); others re-fold"
        " the survivors)",
    )
    ap.add_argument(
        "--forget-refold",
        action="store_true",
        help="force the survivor re-fold path for --forget-files",
    )
    args = ap.parse_args()
    n_modes = sum(
        x is not None for x in (args.source, args.files, args.forget_files)
    )
    if n_modes != 1:
        raise SystemExit(
            "pass exactly one of --source / --files / --forget-files"
        )

    # preflight (same convention as ingest_job): everything checkable
    # from the flags alone fails BEFORE the session and the committed
    # mutation — a SystemExit after update()/forget() leaves the state
    # advanced with the metrics line never printed
    if args.forget_refold and args.forget_files is None:
        raise SystemExit(
            "--forget-refold only applies with --forget-files "
            "(refusing rather than silently running a normal update)"
        )
    specs = [_parse_spec(s, args) for s in args.spec]
    if args.delta_from is not None or args.sample_added_from is not None:
        from recsplit_spark.sketches import ThetaSketch

        if not any(isinstance(s.sketch, ThetaSketch) for s in specs):
            raise SystemExit(
                "--delta-from/--sample-added-from need at least one"
                " theta spec (set algebra)"
            )

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("recsplit-incremental").getOrCreate()
    from recsplit_spark.sketches import IncrementalProfile

    inc = IncrementalProfile(specs, args.keys.split(","), args.path)
    t0 = time.time()
    if args.forget_files is not None:
        metrics = inc.forget(
            spark,
            args.forget_files.split(","),
            refold=args.forget_refold,
        )
    else:
        metrics = inc.update(
            spark,
            source=args.source,
            files=args.files.split(",") if args.files else None,
        )
    out = {"path": args.path, **metrics}
    # optional read-only analytics run BEFORE vacuum (a delta reads the
    # very generations a vacuum would delete) and any failure there —
    # a typo'd gen, a forget-straddled range — still emits the metrics
    # line for the mutation that DID commit
    try:
        if args.estimates:
            rows = inc.estimates(spark).collect()
            out["estimates"] = [
                {
                    **{k: r[k] for k in inc.keys},
                    "name": r["name"],
                    "estimate": r["estimate"],
                }
                for r in rows
            ]
        if args.delta_from is not None or args.sample_added_from is not None:
            from recsplit_spark.sketches import ThetaSketch

            thetas = [s for s in specs if isinstance(s.sketch, ThetaSketch)]
            if args.delta_from is not None:
                out["deltas"] = {
                    s.name: [
                        r.asDict()
                        for r in inc.generation_delta(
                            spark, s.name, args.delta_from
                        ).collect()
                    ]
                    for s in thetas
                }
            if args.sample_added_from is not None:
                out["added_samples"] = {
                    s.name: [
                        r.asDict()
                        for r in inc.generation_sample_added(
                            spark, s.name, args.sample_added_from
                        )
                        .limit(args.sample_limit)
                        .collect()
                    ]
                    for s in thetas
                }
        if args.vacuum is not None:
            out["vacuumed_gens"] = inc.vacuum(spark, keep=args.vacuum)
    except ValueError as e:
        out["wall_sec"] = round(time.time() - t0, 2)
        print(json.dumps(out))
        raise SystemExit(
            f"analytics stage failed after the committed mutation: {e}"
        ) from None
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
