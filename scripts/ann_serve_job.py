#!/usr/bin/env python
"""spark-submit entry point: batched ANN serving over a committed
``IncrementalANN`` store — the query-side counterpart of
``ingest_job.py``'s store-building side.

Reads a parquet of query vectors, answers ALL of them in ONE byte-only
scan of the union of their probe buckets (``search_adc_many``: per-batch
partial top-k per query inside the Arrow kernel, one Q*k-row global
reduce), optionally refines with the batched exact-cosine rerank (one
id-IN re-read of the probe buckets), and writes one parquet of
``(qid, <id_col>, score)`` rows — k per query.

Cluster usage (the north-rule deployment shape, serving side)::

    python scripts/make_pyfiles_zip.py          # -> dist/recsplit_spark.zip
    spark-submit --py-files dist/recsplit_spark.zip \
        scripts/ann_serve_job.py \
        --store   <IncrementalANN path (codec-pinned)> \
        --queries <parquet with (qid, <vec-col>)> \
        --out     <output parquet dir> \
        [--k 10] [--rerank 0] [--vec-col embedding] [--qid-col qid] \
        [--batch-size 256]

Queries are collected to the driver (they are the SMALL side of ANN
serving by definition) and answered in ``--batch-size`` chunks so the
per-task LUT tensor stays bounded (~96 KB/query at m=96: 256 queries ≈
24 MB — fine; thousands would not be). Prints ONE JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True,
                    help="IncrementalANN path (PQ/OPQ/SQ8/residual codec "
                         "pinned — search_adc_many needs the sidecar)")
    ap.add_argument("--queries", required=True,
                    help="parquet of query vectors")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rerank", type=int, default=0,
                    help="exact-cosine refine width (0 = ADC-only; the "
                         "output score column is then pq_score, else "
                         "cosine)")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--qid-col", default="qid",
                    help="query-id column in --queries, preserved in the "
                         "output")
    ap.add_argument("--batch-size", type=int, default=256,
                    help="queries per union-probe scan")
    args = ap.parse_args()

    # preflight: a negative batch size makes the chunk loop EMPTY, so
    # the job would print a success JSON with rows_out 0 and exit 0
    # without writing anything — refuse the nonsense values up front
    if args.k <= 0:
        raise SystemExit(f"--k must be positive (got {args.k})")
    if args.batch_size <= 0:
        raise SystemExit(
            f"--batch-size must be positive (got {args.batch_size})"
        )
    if args.rerank < 0:
        raise SystemExit(f"--rerank must be >= 0 (got {args.rerank})")

    import numpy as np

    from recsplit_spark.pipeline.ann import _list_col_to_matrix
    from recsplit_spark.pipeline.incremental_ann import IncrementalANN
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="ann-serve")
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    t0 = time.time()

    store = IncrementalANN(args.store)
    # the result rows are (qid, <store id_col>, score): a --qid-col that
    # shadows the store's pinned id column would duplicate a column name
    # at the join and fail the parquet write AFTER the search work ran
    try:
        _pinned_id = spark.read.parquet(
            f"{args.store.rstrip('/')}/manifest"
        ).collect()[0]["id_col"]
    except Exception:
        _pinned_id = None  # no committed store; search raises properly
    if _pinned_id is not None and args.qid_col == _pinned_id:
        raise SystemExit(
            f"--qid-col {args.qid_col!r} collides with the store's id "
            "column (the output carries both); rename the query-id "
            "column"
        )
    qtbl = (
        spark.read.parquet(args.queries)
        .select(args.qid_col, args.vec_col)
        .toArrow()
    )
    qvecs = _list_col_to_matrix(qtbl.column(1), np.float64)
    n_q = qtbl.num_rows
    if n_q == 0:
        raise SystemExit(f"no queries in {args.queries}")

    score_col = "cosine" if args.rerank > 0 else "pq_score"

    # ONE global (absolute index -> caller qid) map, built from the
    # Arrow column itself so the qid type — int, string, decimal,
    # whatever the query parquet holds — survives exactly (no DDL
    # string to parse, no first-row type sniffing); the kernel's
    # chunk-local qids are shifted to absolute indices per chunk
    import pyarrow as pa
    from pyspark.sql import functions as F

    id_map = spark.createDataFrame(
        pa.table({
            "__q": pa.array(range(n_q), type=pa.int64()),
            args.qid_col: qtbl.column(0).combine_chunks(),
        })
    )

    n_rows = 0
    first = True
    for lo in range(0, n_q, args.batch_size):
        hi = min(n_q, lo + args.batch_size)
        res = store.search_adc_many(
            spark,
            [qvecs[i] for i in range(lo, hi)],
            k=args.k,
            rerank=args.rerank,
        )
        out = (
            res.withColumn("__q", (F.col("qid") + F.lit(lo)).cast("long"))
            .drop("qid")
            .join(F.broadcast(id_map), "__q")
            .drop("__q")
            .cache()
        )
        n_rows += out.count()  # materialize once; write reuses the cache
        out.write.mode("overwrite" if first else "append").parquet(args.out)
        out.unpersist()
        first = False

    print(json.dumps({
        "n_queries": n_q,
        "k": args.k,
        "rerank": args.rerank,
        "score_col": score_col,
        "rows_out": int(n_rows),
        "out": args.out,
        "wall_s": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
