"""Benchmark decontamination over token arrays.

Finds (and optionally drops or cuts) training documents that contain any
n-token window of a held-out benchmark set — the n-gram-overlap
decontamination pass of GPT-3 appendix C / Lee et al. 2021 §6, here as
two Spark passes that shuffle hashes and span offsets, never token
arrays:

  A. **index** — one scan of the (small) benchmark side folds every
     n-token window into the shared 128-bit hash pair (``h1`` = the
     window-hash contract of ``sketches/multi`` / ``pipeline/dedup``,
     ``h2`` = ``substring_dedup``'s independent confirmation hash) and
     distincts it. The set is gathered to the driver and broadcast —
     16 B/window, so even a 10^8-window benchmark suite is ~1.6 GB;
     ``waves=R`` slices it by pmod(h1, R) when it must stay smaller.
  B. **scan** — one corpus scan per wave marks windows whose (h1, h2)
     is in the benchmark set (sorted-array membership against the
     broadcast slice; exact on the pair — false positives ~W_bench x
     W_corpus / 2^128, negligible at any reachable scale, so no
     token-byte confirmation pass). ``flag``/``drop`` aggregate hits to
     per-doc counts in-kernel and shuffle only contaminated doc ids
     (for real corpora a tiny fraction); ``cut`` emits hit offsets and
     splices them out with ``substring_dedup.cut_spans``.

Scale shape at 10^12 sequences: the corpus is scanned once per wave
with zero corpus-side shuffle; the only exchanges carry contaminated
doc ids (flag/drop) or cut-span offsets (cut). The benchmark side is
broadcast, never joined — decontamination is a membership probe, not a
join, exactly the asymmetry the op has in production (benchmark <<
corpus).

Reference scope note: minperf has no decontamination surface; this
module exists for the north-rule training-data pipeline (token payload,
axes A+B).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .substring_dedup import (
    _batch_unique_pairs,
    _locate_occurrences,
    _pair_member_mask,
    _second_window_hash,
    _wave_slices,
    cut_spans,
)


def benchmark_windows(bench_df, col: str = "tokens", n: int = 13):
    """Pass A: the distinct n-token windows of ``bench_df[col]`` as a
    driver pandas DataFrame[h1 int64, h2 int64] of 128-bit hash pairs
    (the shared window-hash contract + the independent confirmation
    hash). Batch-level dedup in the kernel plus a global ``distinct()``
    keep the shuffle at one 16 B row per partition-distinct window."""
    from ..sketches.multi import _flat_ngram_hashes_pos, _series_to_flat
    from pyspark.sql import functions as F

    def _pairs(batches):
        for pdf in batches:
            flat, lens = _series_to_flat(pdf["__arr"])
            h1, pos = _flat_ngram_hashes_pos(flat, lens, n)
            if len(h1) == 0:
                continue
            h2 = _second_window_hash(flat, pos, n)
            u1, u2, _ = _batch_unique_pairs(h1, h2)
            yield pd.DataFrame(
                {"h1": u1.view(np.int64), "h2": u2.view(np.int64)}
            )

    return (
        bench_df.select(F.col(col).alias("__arr"))
        .mapInPandas(_pairs, schema="h1 long, h2 long")
        .distinct()
        .toPandas()
    )


def window_pairs(df, id_col: str, col: str, n: int = 13):
    """One row per n-token window occurrence:
    ``DataFrame[<id_col>, h1, h2]`` under the SAME 128-bit hash-pair
    contract as ``benchmark_windows`` — the distributed-join side of
    the probe machinery for when BOTH relations are corpus-scale and
    neither may gather to the driver (e.g. ``splits.split_leakage``'s
    join method). No kernel-level dedup: downstream counts are
    per-occurrence, matching ``contamination``'s semantics."""
    from pyspark.sql import functions as F

    from ..sketches.multi import _flat_ngram_hashes_pos, _series_to_flat

    id_type = df.schema[id_col].dataType.simpleString()

    def _pairs(batches):
        for pdf in batches:
            flat, lens = _series_to_flat(pdf["__arr"])
            h1, pos = _flat_ngram_hashes_pos(flat, lens, n)
            if len(h1) == 0:
                continue
            h2 = _second_window_hash(flat, pos, n)
            n_sh = np.maximum(lens - n + 1, 0)
            doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), n_sh)
            ids = pdf["__id"].to_numpy()
            yield pd.DataFrame(
                {
                    "__id": ids[doc_of],
                    "h1": h1.view(np.int64),
                    "h2": h2.view(np.int64),
                }
            )

    return df.select(
        F.col(id_col).alias("__id"), F.col(col).alias("__arr")
    ).mapInPandas(_pairs, schema=f"__id {id_type}, h1 long, h2 long")


def _contam_counts(df, id_col, col, n, bench_pdf, waves):
    """Per-doc contaminated-window counts: DataFrame[<id_col>, cnt] with
    one row per CONTAMINATED doc (clean docs emit nothing — the shuffle
    carries only hits). One corpus scan per wave, membership against a
    broadcast slice of the benchmark window set."""
    from functools import reduce

    from pyspark.sql import DataFrame, functions as F

    from ..sketches.multi import _flat_ngram_hashes_pos, _series_to_flat

    d1_all = bench_pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
    d2_all = bench_pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"__id {id_type}, __c long"
    # corpus-scan parallelism floor (round 6): window hashing + pair
    # membership is heavy per row, so a single-row-group local input
    # must not serialize the kernel onto one task; no-op at scale
    from ..session import ensure_min_partitions

    scan = ensure_min_partitions(
        df.select(F.col(id_col).alias("__id"), F.col(col).alias("__arr"))
    )
    parts = []
    for d1s, d2s, max_run in _wave_slices(d1_all, d2_all, waves):
        b = spark.sparkContext.broadcast((d1s, d2s, max_run))

        def _hits(batches, _b=b):
            d1s_, d2s_, mr = _b.value
            for pdf in batches:
                flat, lens = _series_to_flat(pdf["__arr"])
                h1, pos = _flat_ngram_hashes_pos(flat, lens, n)
                if len(h1) == 0:
                    continue
                h2 = _second_window_hash(flat, pos, n)
                hit = _pair_member_mask(h1, h2, d1s_, d2s_, mr)
                if not hit.any():
                    continue
                n_sh = np.maximum(lens - n + 1, 0)
                doc_of = np.repeat(
                    np.arange(len(lens), dtype=np.int64), n_sh
                )
                cnts = np.bincount(doc_of[hit], minlength=len(lens))
                nz = np.flatnonzero(cnts)
                ids = pdf["__id"].to_numpy()
                yield pd.DataFrame(
                    {"__id": ids[nz], "__c": cnts[nz].astype(np.int64)}
                )

        parts.append(scan.mapInPandas(_hits, schema=out_schema))
    if not parts:
        return spark.createDataFrame([], out_schema)
    counts = reduce(DataFrame.union, parts)
    if waves > 1:
        counts = counts.groupBy("__id").agg(F.sum("__c").alias("__c"))
    return counts


def contamination(
    df,
    bench_df,
    id_col: str = "doc_id",
    col: str = "tokens",
    n: int = 13,
    waves: int = 1,
):
    """``df`` plus ``contam_windows int`` (number of n-token windows of
    the doc that appear verbatim in ``bench_df[col]``) and
    ``contaminated boolean``. The corpus side is one scan per wave plus
    a left join against the (tiny) contaminated-id relation; clean docs
    never shuffle. ``bench_df`` may also be a pre-computed
    ``benchmark_windows`` pandas frame, so one benchmark index serves
    many corpus passes."""
    from pyspark.sql import functions as F

    for c in ("contam_windows", "contaminated"):
        if c in df.columns:
            raise ValueError(f"df already has a {c} column")
    if waves < 1:
        raise ValueError("waves must be >= 1")
    bench_pdf = (
        bench_df
        if isinstance(bench_df, pd.DataFrame)
        else benchmark_windows(bench_df, col, n)
    )
    counts = _contam_counts(df, id_col, col, n, bench_pdf, waves)
    joined = df.join(
        F.broadcast(counts.withColumnRenamed("__id", id_col)),
        id_col,
        "left",
    )
    return (
        joined.withColumn(
            "contam_windows", F.coalesce(F.col("__c"), F.lit(0)).cast("int")
        )
        .withColumn("contaminated", F.col("contam_windows") > 0)
        # the join moved id_col first — restore df's column order so
        # positional consumers (union, parquet appends) stay aligned
        .select(*df.columns, "contam_windows", "contaminated")
    )


def decontaminate(
    df,
    bench_df,
    id_col: str = "doc_id",
    col: str = "tokens",
    n: int = 13,
    mode: str = "drop",
    waves: int = 1,
    len_col: str | None = None,
):
    """Remove benchmark contamination from ``df``:

    - ``mode='drop'`` — filter out every doc containing any benchmark
      n-gram (the GPT-3 appendix-C semantics); returns ``df``'s columns
      unchanged.
    - ``mode='flag'`` — keep all rows, add ``contam_windows`` /
      ``contaminated`` (== ``contamination()``).
    - ``mode='cut'`` — splice the contaminated [pos, pos+n) spans out of
      ``col`` (overlaps merged — ``substring_dedup.cut_spans``), add
      ``removed_tok int``; ``len_col`` refreshed if given. Keeps the
      doc's clean remainder instead of losing the whole doc.

    The input is scanned once per wave (plus the benchmark-side scan) —
    read it from storage or ``.cache()`` it first."""
    if mode not in ("drop", "flag", "cut"):
        raise ValueError(f"mode must be drop|flag|cut, got {mode!r}")
    if mode == "flag":
        return contamination(df, bench_df, id_col, col, n, waves)
    if mode == "drop":
        from pyspark.sql import functions as F

        flagged = contamination(df, bench_df, id_col, col, n, waves)
        return flagged.filter(~F.col("contaminated")).select(*df.columns)
    if waves < 1:
        raise ValueError("waves must be >= 1")
    bench_pdf = (
        bench_df
        if isinstance(bench_df, pd.DataFrame)
        else benchmark_windows(bench_df, col, n)
    )
    occ = _locate_occurrences(df, id_col, col, n, bench_pdf, waves)
    from pyspark.sql import functions as F

    spans = occ.select(F.col("__id").alias(id_col), "pos")
    return cut_spans(df, spans, id_col, col, n, len_col)
