"""DSIR-style importance resampling over token arrays.

Data Selection with Importance Resampling (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"): score every
raw document by how much more likely its hashed n-gram features are
under a TARGET corpus distribution than under the RAW corpus
distribution, then sample documents with probability proportional to
exp(score). The whole estimator is two bounded-size bucket histograms
(the classic hashed-feature trick), so at 10^12 sequences it is: one
scan of each corpus producing a B-row histogram, a driver-side B-entry
log-ratio table, and one scoring scan — no shuffle wider than B rows.

Bucket-fold contract (NOT the sketch window-hash contract): windows fold
as ``h_0 = 0; h_j = pmod(h_{j-1} * 1000003 + token_j, 2^32)`` and
``bucket = pmod(h_n, buckets)`` — plain integer arithmetic so an
external SQL engine can replicate buckets exactly (the driver-contract
oracle recomputes them in DuckDB). Feature collisions are part of
DSIR's design (hashed n-grams), so a weaker-than-xxhash fold costs
nothing statistically. The sketch feeds keep their own
``series_window_hashes`` contract; changing either does not affect the
other.

Scores are INTEGER micro-units: the per-bucket log-ratio is quantized to
``round(1e6 * (log p_target - log p_raw))`` int64 and a document's score
is the exact int64 sum over its windows — associative, reproducible
bit-for-bit on any partitioning and in any SQL engine (float sums are
order-dependent; at 1e6 quantization the rounding error per window is
<= 5e-7, far below the estimator's own variance).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: polynomial fold multiplier + 32-bit modulus (see bucket-fold contract)
_MIX = 1000003
_MOD = 1 << 32

#: windows per kernel chunk — same cache-residency rationale as
#: multi._flat_ngram_hashes_pos (the ~6 window-sized temporaries must not
#: stream DRAM under 32-way executor concurrency)
_CHUNK_W = 1 << 16


def _flat_token_col(col) -> tuple[np.ndarray, np.ndarray]:
    """pyarrow (Chunked) list<int> array -> (flat int64 values, per-doc
    lens int64). Zero-copy flatten; slice offsets normalized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, np.diff(offs)


def _window_buckets(
    flat: np.ndarray, lens: np.ndarray, n: int, buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket ids of every n-token window, windows-per-doc). Chunked to
    ``_CHUNK_W`` windows on document boundaries; docs with < n tokens
    emit nothing. numpy ``%`` with a positive modulus is pmod (result
    sign follows the divisor), matching the SQL side exactly."""
    n_w = np.maximum(lens - n + 1, 0)
    total = int(n_w.sum())
    if total == 0:
        return np.empty(0, np.int64), n_w
    out = np.empty(total, dtype=np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    win_ends = np.cumsum(n_w)
    if total <= _CHUNK_W:
        bounds = np.array([0, len(lens)])
    else:
        cuts = np.searchsorted(
            win_ends, np.arange(_CHUNK_W, total, _CHUNK_W), side="left"
        )
        bounds = np.unique(np.concatenate([[0], cuts + 1, [len(lens)]]))
    for a, b in zip(bounds[:-1], bounds[1:]):
        w0 = 0 if a == 0 else int(win_ends[a - 1])
        w1 = int(win_ends[b - 1])
        if w1 <= w0:
            continue
        nw = n_w[a:b]
        doc_of = np.repeat(np.arange(b - a, dtype=np.int64), nw)
        ends = np.cumsum(nw)
        pos = (
            doc_starts[a:b][doc_of]
            + np.arange(w1 - w0, dtype=np.int64)
            - np.repeat(ends - nw, nw)
        )
        h = np.zeros(w1 - w0, dtype=np.int64)
        for j in range(n):
            # h < 2^32, |token| < 2^31: h*_MIX + t < 2^52 + 2^31 — exact
            # in int64, identical to BIGINT arithmetic SQL-side
            h = (h * _MIX + flat[pos + j]) % _MOD
        out[w0:w1] = h % buckets
    return out, n_w


def hashed_window_counts(df, tokens_col: str, *, buckets: int, n: int = 1):
    """DataFrame[bucket int, cnt long]: corpus-wide hashed n-gram window
    histogram. ONE scan via ``mapInArrow`` — each task folds its rows
    into a local B-entry bincount and emits the nonzero entries, so the
    shuffle is <= B rows per task regardless of corpus size (a
    posexplode + groupBy would shuffle every window as a row)."""
    from pyspark.sql import functions as F

    b, nn = int(buckets), int(n)
    if b < 2:
        raise ValueError("buckets must be >= 2")

    def _partial(batches):
        acc = np.zeros(b, dtype=np.int64)
        for batch in batches:
            flat, lens = _flat_token_col(batch.column(0))
            w, _ = _window_buckets(flat, lens, nn, b)
            if len(w):
                acc += np.bincount(w, minlength=b)
        nz = np.flatnonzero(acc)
        if len(nz):
            yield pa.record_batch(
                [pa.array(nz.astype(np.int32)), pa.array(acc[nz])],
                names=["bucket", "cnt"],
            )

    partials = df.select(tokens_col).mapInArrow(
        _partial, schema="bucket int, cnt long"
    )
    return partials.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def feature_logratio_micro(
    target_counts, raw_counts, *, buckets: int, alpha: float = 1.0
) -> np.ndarray:
    """B-entry int64 table of ``round(1e6 * (log p_target - log p_raw))``
    with add-``alpha`` smoothing on both sides. Driver-sized by
    construction (B entries — the same driver-residency argument as IVF
    centroids / PQ codebooks); inputs are the ``hashed_window_counts``
    DataFrames, gathered here as two B-row Arrow tables."""

    def _gather(cdf) -> tuple[np.ndarray, int]:
        tbl = cdf.toArrow()
        cnt = np.zeros(buckets, dtype=np.float64)
        idx = tbl.column("bucket").to_numpy(zero_copy_only=False)
        cnt[idx] = tbl.column("cnt").to_numpy(zero_copy_only=False)
        return cnt, int(cnt.sum())

    t, t_tot = _gather(target_counts)
    r, r_tot = _gather(raw_counts)
    if t_tot == 0 or r_tot == 0:
        raise ValueError("empty target or raw histogram")
    a = float(alpha)
    log_p_t = np.log(t + a) - np.log(t_tot + a * buckets)
    log_p_r = np.log(r + a) - np.log(r_tot + a * buckets)
    return np.round(1e6 * (log_p_t - log_p_r)).astype(np.int64)


def importance_scores(
    df,
    tokens_col: str,
    logratio_micro: np.ndarray,
    *,
    n: int = 1,
    out_col: str = "dsir_score_micro",
):
    """Add the int64 importance score: sum of the bucket log-ratios over
    the doc's n-token windows. ONE arrow_udf projection, zero shuffle;
    the log-ratio table rides an explicit broadcast (B entries — at
    B=2^20 that is 8 MB, closure-prohibitive but broadcast-cheap). Docs
    with < n tokens score 0."""
    from pyspark.sql.functions import arrow_udf
    from pyspark.sql.types import LongType

    b = len(logratio_micro)
    nn = int(n)
    bcast = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(logratio_micro, dtype=np.int64)
    )

    def _score(col: pa.Array) -> pa.Array:
        lr = bcast.value
        flat, lens = _flat_token_col(col)
        w, n_w = _window_buckets(flat, lens, nn, b)
        out = np.zeros(len(lens), dtype=np.int64)
        nz = np.flatnonzero(n_w)
        if len(nz):
            # reduceat over nonzero segments only (an empty segment would
            # misattribute — same guard as dedup._batch_pair_intersections)
            starts = (np.cumsum(n_w) - n_w)[nz]
            out[nz] = np.add.reduceat(lr[w], starts)
        return pa.array(out, type=pa.int64())

    return df.withColumn(out_col, arrow_udf(_score, LongType())(tokens_col))


def gumbel_topk(scored, k: int, *, seed: int = 0,
                score_col: str = "dsir_score_micro",
                id_col: str = "doc_id"):
    """Deterministic importance SAMPLE of k docs with probability
    proportional to ``exp(score)`` — the exponential-rank / Gumbel-top-k
    trick: key = score + Gumbel(0,1) noise, take the k largest. The
    noise is ``-log(-log u)`` with u a fixed-point uniform from
    ``xxhash64(id, seed)``, so the draw is reproducible on any
    partitioning and any cluster size. Pure Column exprs; the global
    top-k plans as TakeOrderedAndProject (no full sort)."""
    from pyspark.sql import functions as F

    # uniform in (0, 1): (h + 2^63 + 1) / (2^64 + 2) over the full hash
    # range keeps u strictly inside the open interval (log-safe)
    u = (F.xxhash64(F.col(id_col), F.lit(seed)).cast("double") + 9.223372036854776e18 + 1.0) / 1.8446744073709552e19
    key = F.col(score_col).cast("double") / 1e6 - F.log(-F.log(u))
    return scored.orderBy(F.desc(key)).limit(k)
