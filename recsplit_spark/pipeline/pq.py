"""Product quantization (PQ) — a mergeable-by-construction vector sketch.

PQ (Jegou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search") splits a d-dim vector into ``m`` contiguous subvectors
and quantizes each against its own ``ks``-entry codebook, compressing a
float32 vector to ``m`` bytes (ks <= 256): 64 dims -> 8 bytes at m=8
(32x), 768 dims -> 96 bytes at m=96. Approximate inner products against
a query are then Asymmetric Distance Computation (ADC): one (m, ks)
lookup table per query, score = sum_j LUT[j, code_j] — no float vectors
touched at scan time.

Why this is the 100 TB embedding-store shape: 10^12 x 768-dim float32
vectors are ~3 PB; PQ codes at m=96 are ~96 TB and the ADC scan reads
bytes, not floats. The encode pass is one arrow_udf projection (no
shuffle); search is an ADC scan + TakeOrderedAndProject; composed with
``IVFIndex.assign`` the codes live in centroid-partitioned files and the
probe IN-filter prunes partitions before any byte is read.

Cosine contract: vectors are L2-normalized BEFORE subspace split (same
unit-vector contract as ``IVFIndex``), so the ADC score estimates the
cosine similarity directly. Codebooks minimize per-subspace L2
reconstruction error (argmin ||x_j - c||^2), the standard PQ objective,
which bounds the inner-product estimation error by the reconstruction
error (Cauchy-Schwarz on the residual).

Reference parity note: the reference repo (thomasmueller/minperf) has no
ANN/vector component; this module extends the pipeline the same way
``ann.py`` does, re-using its Arrow column kernels.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from .ann import (
    _SCORE_CHUNK_ELEMS,
    _chunked_argmax_scores,
    _cosine_expr,
    _list_col_to_matrix,
    _normalize_rows,
)

#: serialized-codebook header: magic, m, ks, dsub, iters, seed. The
#: codebook bytes ARE the code semantics — two codecs with different
#: trained centroids read each other's codes as garbage — so (like the
#: sketch-state magics) any change to the training or layout below needs
#: a new magic, never a reinterpretation of PQC1 bytes.
_HDR = struct.Struct("<4sIIIII")
# rerank candidate-fetch dispatch: at most this many ids ride a literal
# IN filter (parquet-pushed); above it the fetch switches to a broadcast
# semi-join — a Q*k*rerank-literal In expression explodes the Catalyst
# tree (driver OOM at 128K ids). Both branches are row-identical
# (tested); module-level so tests can pin either branch.
_RERANK_IN_THRESHOLD = 1024

_MAGIC = b"PQC1"
#: residual codec: same header, followed by the 32-byte sha256 of the
#: float32 centroid matrix the residuals were taken against — residual
#: codes are meaningless under any other centroid set, so decode REFUSES
#: a mismatched index (never adapts), mirroring IncrementalANN's
#: centroid_sha manifest pin.
_MAGIC_R = b"PQR1"
#: OPQ codec: same header, followed by the (d, d) float32 rotation
#: matrix, then the codebooks. The rotation is part of the code
#: semantics exactly like the codebooks (codes quantize R @ x).
_MAGIC_O = b"PQO1"
#: SQ8 scalar quantizer: same header (m=d, ks=256, dsub=1), followed by
#: the per-dimension float32 vmin then scale vectors — the affine grid
#: IS the codebook, so the blob stores 2d floats instead of d*256.
_MAGIC_S = b"SQ81"


def _binary_col_to_codes(col, m: int) -> np.ndarray:
    """pyarrow (Chunked) binary array of m-byte codes -> (n, m) uint8.

    Zero-copy: binary-array data is contiguous between the first and last
    offset, so the whole column reshapes without per-row Python. Ragged
    or null codes are a data bug and fail loudly."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, m), dtype=np.uint8)
    if col.null_count:
        raise ValueError("pq code column contains nulls")
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ]
    if not (np.diff(offs) == m).all():
        raise ValueError(f"pq code column is not fixed {m}-byte codes")
    flat = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return flat[offs[0] : offs[-1]].reshape(n, m)


def _codes_to_binary_array(codes: np.ndarray) -> pa.Array:
    """(n, m) uint8 -> pyarrow binary array of m-byte values, zero-copy
    from the flat buffer (no per-row bytes objects)."""
    n, m = codes.shape
    offsets = pa.py_buffer(
        (np.arange(n + 1, dtype=np.int32) * np.int32(m)).tobytes()
    )
    data = pa.py_buffer(np.ascontiguousarray(codes).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])


def _chunked_argmin_l2(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """argmin_c ||x - cb[c]||^2 == argmax_c (x @ cb.T - ||cb||^2 / 2),
    score matrix chunked to ``_SCORE_CHUNK_ELEMS`` (same working-set
    rationale as ``ann._chunked_argmax_scores`` — subvectors are NOT unit
    norm, so plain dot-argmax would be the wrong objective)."""
    half_sq = 0.5 * (cb * cb).sum(axis=1)
    cbt = np.ascontiguousarray(cb.T)
    rows = max(1, _SCORE_CHUNK_ELEMS // max(1, len(cb)))
    out = np.empty(len(x), dtype=np.int64)
    for lo in range(0, len(x), rows):
        hi = min(len(x), lo + rows)
        out[lo:hi] = (x[lo:hi] @ cbt - half_sq).argmax(axis=1)
    return out


def _fit_subspace_codebooks(xs: np.ndarray, ks: int, iters: int,
                            rng) -> np.ndarray:
    """Per-subspace vectorized Lloyd over (n, m, dsub) training data ->
    (m, ks, dsub) float64 codebooks (scatter-add update, chunked
    argmin-L2 assignment; empty clusters keep their previous centroid).
    Shared by the raw-vector and residual codecs."""
    n, m, dsub = xs.shape
    cb = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        sub = np.ascontiguousarray(xs[:, j, :])
        c = sub[rng.choice(n, size=ks, replace=False)].copy()
        for _ in range(iters):
            a = _chunked_argmin_l2(sub, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, sub)
            counts = np.bincount(a, minlength=ks)
            nz = counts > 0
            c[nz] = sums[nz] / counts[nz, None]
        cb[j] = c
    return cb


def _encode_codes(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, d) data + (m, ks, dsub) float32/64 codebooks -> (n, m) uint8
    codes (chunked argmin-L2 per subspace)."""
    n = len(x)
    m, _, dsub = cb.shape
    xs = x.reshape(n, m, dsub)
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        codes[:, j] = _chunked_argmin_l2(
            np.ascontiguousarray(xs[:, j, :]), cb[j]
        )
    return codes


def _unit(query: np.ndarray) -> np.ndarray:
    """float64 L2-normalized copy of one query vector."""
    q = np.asarray(query, dtype=np.float64)
    return q / max(np.linalg.norm(q), 1e-12)


def _query_lut(codebooks: np.ndarray, m: int, y: np.ndarray) -> np.ndarray:
    """(m, ks) ADC lookup table for one (already unit/rotated) query:
    LUT[j, c] = <y_j, codebook_j[c]>; float32 to match the encode-side
    precision."""
    dsub = codebooks.shape[2]
    qs = y.reshape(m, dsub)
    return np.einsum(
        "jd,jkd->jk", qs, codebooks, optimize=True
    ).astype(np.float32)


def _gather_unit_sample(df, vec_col: str, sample_size: int, seed: int,
                        m: int, what: str) -> np.ndarray:
    """ONE Arrow gather of <= sample_size vectors (columnar buffers, no
    Row objects), L2-normalized float64, with the shared empty- and
    divisibility-contract checks — the training-sample shape all three
    codec fits share (sampling/normalization here is serialization-
    adjacent: change it and freshly-fitted codecs diverge from persisted
    ones, so it must change in ONE place)."""
    n = df.count()
    frac = min(1.0, sample_size / max(1, n))
    col = df.select(vec_col)
    tbl = (col if frac >= 1.0 else col.sample(frac, seed=seed)).toArrow()
    x = _list_col_to_matrix(tbl.column(0), np.float64)
    if len(x) == 0:
        raise ValueError(f"cannot fit {what} on an empty DataFrame")
    _normalize_rows(x)
    if x.shape[1] % m:
        raise ValueError(f"dim {x.shape[1]} not divisible by m={m}")
    return x


def _drop_stale_broadcast(codec) -> None:
    """Refit invalidates the cached session-keyed broadcast."""
    old = getattr(codec, "_bcast", None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — originating context may be gone
            pass
        codec._bcast = None
        codec._bcast_sc = None


def _getstate_without_broadcast(self):
    # Broadcast handles are session-bound and not driver-picklable: drop
    # the cache so a fitted codec pickles and re-broadcasts lazily
    state = self.__dict__.copy()
    state.pop("_bcast", None)
    state.pop("_bcast_sc", None)
    return state


def _make_encode_fn(bcast, m: int):
    """Encode batch fn closing over ONLY the broadcast handle (same
    pickled-closure discipline as ``ann._make_assign_fn``)."""

    def _encode(v: pa.Array) -> pa.Array:
        cb = bcast.value  # (m, ks, dsub) float32
        x = _normalize_rows(_list_col_to_matrix(v, np.float32))
        n = len(x)
        if n == 0:
            return _codes_to_binary_array(np.empty((0, m), dtype=np.uint8))
        dsub = cb.shape[2]
        if x.shape[1] != m * dsub:
            raise ValueError(
                f"vector dim {x.shape[1]} != m*dsub = {m * dsub}"
            )
        return _codes_to_binary_array(_encode_codes(x, cb))

    return _encode


class PQCodec:
    """Product-quantization codec over an ``array<float>`` column.

    ``fit`` trains ``m`` per-subspace codebooks (driver-side vectorized
    Lloyd over ONE Arrow-gathered sample — codebooks are m*ks*dsub
    floats, ~786 KB at m=96/ks=256/d=768, always driver-sized no matter
    the corpus); ``encode`` adds an m-byte binary code column (arrow_udf
    projection, zero shuffle, codebooks ride one explicit broadcast);
    ``search`` is the ADC scan; ``search_rerank`` refines the ADC top
    k*rerank candidates with exact JVM-side cosine (the standard
    PQ-then-refine recipe).
    """

    #: raw-vector codes: score needs only the code column (ResidualPQ
    #: sets True — its scores need the centroid-id column too)
    needs_centroid = False

    def __init__(self, m: int = 8, ks: int = 256, iters: int = 12, seed: int = 7):
        if not (2 <= ks <= 256):
            raise ValueError("ks must be in [2, 256] (codes are uint8)")
        self.m = int(m)
        self.ks = int(ks)
        self.iters = int(iters)
        self.seed = int(seed)
        self.codebooks: np.ndarray | None = None  # (m, ks_eff, dsub) f64

    # -- training --------------------------------------------------------
    def fit(self, df, vec_col: str, sample_size: int = 20_000) -> "PQCodec":
        """Train per-subspace codebooks on an Arrow-gathered sample.

        One gather of <= sample_size vectors (columnar buffers, no Row
        objects); per-subspace Lloyd is fully vectorized (scatter-add
        update, chunked argmin-L2 assignment). Empty clusters keep their
        previous centroid, matching ``IVFIndex`` Lloyd semantics."""
        x = _gather_unit_sample(df, vec_col, sample_size, self.seed,
                                self.m, "PQ")
        xs = x.reshape(len(x), self.m, x.shape[1] // self.m)
        rng = np.random.default_rng(self.seed)
        ks = min(self.ks, len(x))
        cb = _fit_subspace_codebooks(xs, ks, self.iters, rng)
        # quantize to float32 at the training boundary: encode broadcasts
        # float32 anyway, and this makes to_bytes lossless (a freshly
        # fitted and a deserialized codec produce bit-identical codes and
        # ADC scores)
        self.codebooks = cb.astype(np.float32).astype(np.float64)
        _drop_stale_broadcast(self)
        return self

    # -- encode ----------------------------------------------------------
    def _codebook_broadcast(self, df):
        # one broadcast per fitted codec, session-keyed (same cache
        # discipline as IVFIndex.assign — a stale broadcast from a
        # replaced SparkContext fails on the new session's executors)
        sc = df.sparkSession.sparkContext
        bcast = getattr(self, "_bcast", None)
        if bcast is None or getattr(self, "_bcast_sc", None) is not sc:
            bcast = sc.broadcast(
                np.ascontiguousarray(self.codebooks, dtype=np.float32)
            )
            self._bcast = bcast
            self._bcast_sc = sc
        return bcast

    def encode(self, df, vec_col: str, out_col: str = "pq_code"):
        """Add the m-byte PQ code column. ONE arrow_udf projection — the
        scan shape at 10^12 vectors is read-encode-write with zero
        shuffle; write the output partitioned however the caller's ANN
        layout wants (e.g. after ``IVFIndex.assign``)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BinaryType

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        bcast = self._codebook_broadcast(df)
        _enc = arrow_udf(_make_encode_fn(bcast, self.m), BinaryType())
        return df.withColumn(out_col, _enc(vec_col))

    # -- search ----------------------------------------------------------
    def _lut(self, query: np.ndarray) -> np.ndarray:
        return _query_lut(self.codebooks, self.m, _unit(query))

    def score(self, encoded_df, query: np.ndarray, code_col: str = "pq_code",
              out_col: str = "pq_score"):
        """Add the ADC approximate-cosine column for one query vector.

        The (m, ks) LUT is <= 96*256*4 = 96 KB — small enough to ship in
        the task closure (per-task, not per-row; an explicit broadcast
        would add a round trip for no working-set win)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import FloatType

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        lut = self._lut(query)
        m = self.m
        j_idx = np.arange(m)[None, :]

        def _adc(codes: pa.Array) -> pa.Array:
            c = _binary_col_to_codes(codes, m)
            if len(c) == 0:
                return pa.array(np.empty(0, dtype=np.float32), type=pa.float32())
            return pa.array(lut[j_idx, c].sum(axis=1), type=pa.float32())

        return encoded_df.withColumn(
            out_col, arrow_udf(_adc, FloatType())(code_col)
        )

    def search(self, encoded_df, query: np.ndarray, k: int = 10,
               code_col: str = "pq_code"):
        """ADC top-k: one byte-scan + TakeOrderedAndProject (no full
        sort). Compose with IVF by filtering ``encoded_df`` to the probe
        buckets first — the IN-filter prunes partitions before any code
        is read."""
        from pyspark.sql import functions as F

        scored = self.score(encoded_df, query, code_col=code_col)
        return scored.orderBy(F.desc("pq_score")).limit(k)

    def search_many(self, encoded_df, queries, k: int = 10,
                    code_col: str = "pq_code", id_col: str = "vec_id"):
        """Batched ADC top-k for Q queries in ONE scan of the codes —
        the serving shape: per-BATCH partial top-k per query inside the
        Arrow kernel (only Q*k rows per batch ever leave an executor,
        not Q scores per vector), then one tiny global reduce
        (Window row_number over ~batches * Q * k rows). Returns
        ``DataFrame[qid int, <id_col>, pq_score float]`` with k rows
        per query, ordered within each query by score desc; values
        match ``search`` per query (tested). LUTs stack to a
        (Q, m, ks) float32 tensor shipped in the task closure —
        96 KB/query at m=96/ks=256, so batch a few hundred queries per
        call and chunk above that."""
        import pandas as pd
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        luts = np.stack([self._lut(q) for q in queries])  # (Q, m, ks)
        nq, m = len(queries), self.m
        j_idx = np.arange(m)[None, :]
        id_type = encoded_df.schema[id_col].dataType.simpleString()

        def _topk(batches):
            for b in batches:
                ids = b.column(0).to_numpy(zero_copy_only=False)
                codes = _binary_col_to_codes(b.column(1), m)
                nb = len(codes)
                if nb == 0:
                    continue
                kk = min(k, nb)
                # (Q, B): gather LUT rows per subspace and sum — chunk B
                # so the (Q, rows, m) gather stays cache-resident
                rows = max(1, _SCORE_CHUNK_ELEMS // max(1, nq * m))
                out_q, out_i, out_s = [], [], []
                scores = np.empty((nq, nb), dtype=np.float32)
                for lo in range(0, nb, rows):
                    hi = min(nb, lo + rows)
                    scores[:, lo:hi] = luts[:, j_idx, codes[lo:hi]].sum(
                        axis=2
                    )
                part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                for q in range(nq):
                    out_q.append(np.full(kk, q, dtype=np.int32))
                    out_i.append(ids[part[q]])
                    out_s.append(scores[q, part[q]])
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(
                        {
                            "qid": np.concatenate(out_q),
                            id_col: np.concatenate(out_i),
                            "pq_score": np.concatenate(out_s),
                        }
                    ),
                    preserve_index=False,
                )

        partial = encoded_df.select(id_col, code_col).mapInArrow(
            _topk, schema=f"qid int, {id_col} {id_type}, pq_score float"
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("pq_score"), F.asc(id_col)
        )
        return (
            partial.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def search_rerank(self, encoded_df, vec_col: str, query: np.ndarray,
                      k: int = 10, rerank: int = 4,
                      code_col: str = "pq_code"):
        """ADC top ``k*rerank`` candidates, re-ranked by EXACT cosine on
        the original vector column (standard PQ refine step: the byte
        scan does the winnowing, floats are only read for k*rerank
        rows)."""
        from pyspark.sql import functions as F

        cand = self.search(encoded_df, query, k=k * rerank, code_col=code_col)
        q = np.asarray(query, dtype=np.float64)
        return (
            cand.withColumn("cosine", _cosine_expr(vec_col, q))
            .orderBy(F.desc("cosine"))
            .limit(k)
        )

    # -- persistence -------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Header + float32 codebook bytes (see _HDR contract note)."""
        if self.codebooks is None:
            raise RuntimeError("fit() first")
        m, ks, dsub = self.codebooks.shape
        hdr = _HDR.pack(_MAGIC, m, ks, dsub, self.iters, self.seed)
        return hdr + np.ascontiguousarray(
            self.codebooks, dtype=np.float32
        ).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "PQCodec":
        magic, m, ks, dsub, iters, seed = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError(f"bad PQ codec magic {magic!r}")
        body = np.frombuffer(data, dtype=np.float32, offset=_HDR.size)
        if body.size != m * ks * dsub:
            raise ValueError("PQ codec byte length does not match header")
        codec = cls(m=m, ks=ks, iters=iters, seed=seed)
        codec.codebooks = body.reshape(m, ks, dsub).astype(np.float64)
        return codec

    __getstate__ = _getstate_without_broadcast


def _eigen_allocation(evals: np.ndarray, m: int) -> np.ndarray:
    """Parametric-OPQ dimension allocation (Ge, He, Ke & Sun 2014 §4
    objective): assign the d principal directions to ``m`` subspaces so
    the per-subspace variance PRODUCTS balance — realized as LPT greedy
    over SHIFTED non-negative costs processed descending (i.e. smallest
    eigenvalue first), each to the non-full subspace with the least
    accumulated cost. The processing order is part of the test-pinned
    (and hence wire-format) behavior. Returns a length-d permutation: position p of the
    rotated vector holds principal direction perm[p], laid out as m
    contiguous dsub-blocks."""
    d = len(evals)
    dsub = d // m
    logs = np.log(np.maximum(evals, 1e-30))
    # LPT-style balancing in a shifted non-negative cost domain:
    # cost_i = max(log) - log_i >= 0, processed DESCENDING (smallest
    # eigenvalue first), each to the open subspace with the least
    # accumulated cost. Every subspace gets exactly dsub items, so the
    # constant shift cancels and balanced costs == balanced log-variance
    # sums. (A naive argmin over raw negative logs re-picks the subspace
    # it just filled — adding a negative value keeps it "smallest".)
    cost = logs.max() - logs
    order = np.argsort(-cost, kind="stable")
    sums = np.zeros(m)
    fill = np.zeros(m, dtype=np.int64)
    slots = [[] for _ in range(m)]
    for ev_i in order:
        open_ = np.flatnonzero(fill < dsub)
        j = open_[np.argmin(sums[open_])]
        slots[j].append(int(ev_i))
        sums[j] += cost[ev_i]
        fill[j] += 1
    return np.concatenate([np.array(s, dtype=np.int64) for s in slots])


def _make_opq_encode_fn(bcast, m: int):
    """OPQ encode batch fn: normalize, rotate, quantize. Closes over
    ONLY the broadcast handle carrying (codebooks f32, rotation f32)."""

    def _encode(v: pa.Array) -> pa.Array:
        cb, rot = bcast.value  # (m, ks, dsub) f32, (d, d) f32
        x = _normalize_rows(_list_col_to_matrix(v, np.float32))
        n = len(x)
        if n == 0:
            return _codes_to_binary_array(np.empty((0, m), dtype=np.uint8))
        if x.shape[1] != rot.shape[0]:
            raise ValueError(
                f"vector dim {x.shape[1]} != rotation dim {rot.shape[0]}"
            )
        return _codes_to_binary_array(_encode_codes(x @ rot.T, cb))

    return _encode


def _make_residual_encode_fn(bcast, m: int):
    """Residual-encode batch fn: normalize, subtract the assigned
    centroid, quantize the residual. Closes over ONLY the broadcast
    handle carrying (codebooks f32, centroids f32)."""

    def _encode(v: pa.Array, cid: pa.Array) -> pa.Array:
        cb, cent = bcast.value  # (m, ks, dsub) f32, (k, d) f32
        x = _normalize_rows(_list_col_to_matrix(v, np.float32))
        n = len(x)
        if n == 0:
            return _codes_to_binary_array(np.empty((0, m), dtype=np.uint8))
        dsub = cb.shape[2]
        if x.shape[1] != m * dsub:
            raise ValueError(
                f"vector dim {x.shape[1]} != m*dsub = {m * dsub}"
            )
        if isinstance(cid, pa.ChunkedArray):
            cid = cid.combine_chunks()
        if cid.null_count:
            raise ValueError("centroid-id column contains nulls")
        c = cid.to_numpy(zero_copy_only=False).astype(np.int64)
        # range check: a sentinel -1 would silently WRAP to the last
        # centroid via numpy indexing and corrupt persisted codes
        if len(c) and (c.min() < 0 or c.max() >= len(cent)):
            raise ValueError(
                f"centroid id out of range [0, {len(cent)}) in encode"
            )
        x -= cent[c]
        return _codes_to_binary_array(_encode_codes(x, cb))

    return _encode


def _make_sq8_encode_fn(bcast):
    """SQ8 encode batch fn: normalize, affine-round per dimension.
    Closes over ONLY the broadcast handle carrying (vmin f32, scale
    f32). Rounding onto a uniform grid IS the argmin quantizer, so
    codes match the generic PQ machinery's semantics at O(n*d) instead
    of O(n*d*256)."""

    def _encode(v: pa.Array) -> pa.Array:
        vmin, scale = bcast.value
        x = _normalize_rows(_list_col_to_matrix(v, np.float32))
        n = len(x)
        d = len(vmin)
        if n == 0:
            return _codes_to_binary_array(np.empty((0, d), dtype=np.uint8))
        if x.shape[1] != d:
            raise ValueError(f"vector dim {x.shape[1]} != fitted dim {d}")
        out = np.empty((n, d), dtype=np.uint8)
        # chunk so the f32 temporaries stay L2-resident — a whole Arrow
        # batch is ~MBs of (x - vmin) / scale scratch, and 32-way
        # executor concurrency on this DRAM-walled box punishes that
        # (same chunking rationale as kernel.CHUNK_ELEMS / the sketch
        # updates). Exact division, not reciprocal multiply: a half-ulp
        # difference would flip boundary codes and break the
        # rounding == grid-argmin equivalence the class is built on.
        rows = max(1, _SCORE_CHUNK_ELEMS // (4 * max(1, d)))
        for lo in range(0, n, rows):
            hi = min(n, lo + rows)
            c = np.rint((x[lo:hi] - vmin) / scale)
            np.clip(c, 0, 255, out=c)
            out[lo:hi] = c.astype(np.uint8)
        return _codes_to_binary_array(out)

    return _encode


class SQ8Codec(PQCodec):
    """Per-dimension scalar 8-bit quantization (the Faiss SQ8 shape):
    each normalized coordinate maps affinely onto its own 256-point
    uniform grid — 4x compression (d bytes/vector), scores near-exact.
    The complement to PQ on the compression/accuracy dial: PQ at m=d/8
    is 32x with a few-percent ADC error; SQ8 is 4x with ~0.1% error
    (255-step grid over the per-dim range), usually rerank-free.

    Implementation insight: SQ8 IS product quantization with m=d,
    ks=256, dsub=1 and the affine grid as the codebook — so ``score``,
    ``search``, ``search_many``, ``search_rerank`` and the whole IVFADC
    composition (``ivfadc_search``/``_many``, the IncrementalANN codec
    sidecar) are INHERITED from ``PQCodec`` unchanged, LUTs and plans
    included ((d, 256) LUT = 64 KB at d=64, same scale as PQ's). Only
    ``fit`` (per-dim ranges from the shared sample gather) and
    ``encode`` (O(n*d) affine rounding — argmin on a uniform grid IS
    rounding) are specialized, and SQ81 blobs store 2d floats (vmin,
    scale) instead of d*256 codebook entries."""

    def __init__(self, iters: int = 0, seed: int = 7):
        # m/ks are data-determined at fit time (m=d, ks=256); iters is
        # kept for header-layout parity but unused (no Lloyd here)
        super().__init__(m=1, ks=256, iters=iters, seed=seed)
        self.vmin: np.ndarray | None = None  # (d,) f64
        self.scale: np.ndarray | None = None  # (d,) f64

    @staticmethod
    def _grid_codebooks(vmin: np.ndarray, scale: np.ndarray) -> np.ndarray:
        """(d, 256, 1) float64 uniform grids — the PQ-compatible view of
        the affine quantizer, derived from the SERIALIZED f32 vectors so
        a fitted and a reloaded codec score bit-identically."""
        grid = vmin[:, None] + scale[:, None] * np.arange(256)
        return grid.astype(np.float32).astype(np.float64)[:, :, None]

    def _set_range(self, vmin: np.ndarray, scale: np.ndarray) -> None:
        self.vmin = vmin.astype(np.float32).astype(np.float64)
        self.scale = scale.astype(np.float32).astype(np.float64)
        self.m = len(vmin)
        self.codebooks = self._grid_codebooks(self.vmin, self.scale)
        _drop_stale_broadcast(self)

    # -- training --------------------------------------------------------
    def fit(self, df, vec_col: str, sample_size: int = 20_000) -> "SQ8Codec":
        """Per-dimension [min, max] from the shared sample gather (unit
        vectors, so ranges are bounded by [-1, 1] regardless of input
        scale; a slight margin absorbs sample-vs-corpus range error)."""
        x = _gather_unit_sample(df, vec_col, sample_size, self.seed, 1, "SQ8")
        vmin = x.min(axis=0)
        vmax = x.max(axis=0)
        span = vmax - vmin
        margin = 0.01 * np.maximum(span, 1e-6)
        vmin = vmin - margin
        scale = (span + 2 * margin) / 255.0
        self._set_range(vmin, scale)
        return self

    # -- encode ----------------------------------------------------------
    def _codebook_broadcast(self, df):
        # ships (vmin, scale) f32 — 2d floats, not the d*256 grid
        sc = df.sparkSession.sparkContext
        bcast = getattr(self, "_bcast", None)
        if bcast is None or getattr(self, "_bcast_sc", None) is not sc:
            bcast = sc.broadcast(
                (
                    np.ascontiguousarray(self.vmin, dtype=np.float32),
                    np.ascontiguousarray(self.scale, dtype=np.float32),
                )
            )
            self._bcast = bcast
            self._bcast_sc = sc
        return bcast

    def encode(self, df, vec_col: str, out_col: str = "pq_code"):
        """d-byte code column via affine rounding — still ONE
        zero-shuffle arrow_udf projection."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BinaryType

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        bcast = self._codebook_broadcast(df)
        _enc = arrow_udf(_make_sq8_encode_fn(bcast), BinaryType())
        return df.withColumn(out_col, _enc(vec_col))

    # -- persistence -------------------------------------------------------
    def to_bytes(self) -> bytes:
        """SQ81 header + float32 vmin + float32 scale."""
        if self.codebooks is None:
            raise RuntimeError("fit() first")
        d = self.m
        hdr = _HDR.pack(_MAGIC_S, d, 256, 1, self.iters, self.seed)
        return (
            hdr
            + np.ascontiguousarray(self.vmin, dtype=np.float32).tobytes()
            + np.ascontiguousarray(self.scale, dtype=np.float32).tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "SQ8Codec":
        magic, d, ks, dsub, iters, seed = _HDR.unpack_from(data, 0)
        if magic != _MAGIC_S:
            raise ValueError(f"bad SQ8 codec magic {magic!r}")
        if ks != 256 or dsub != 1:
            raise ValueError("malformed SQ8 header")
        body = np.frombuffer(data, dtype=np.float32, offset=_HDR.size)
        if body.size != 2 * d:
            raise ValueError("SQ8 codec byte length does not match header")
        codec = cls(iters=iters, seed=seed)
        codec._set_range(
            body[:d].astype(np.float64), body[d:].astype(np.float64)
        )
        return codec


class OPQCodec(PQCodec):
    """Parametric OPQ (Ge, He, Ke & Sun 2014): one orthogonal rotation
    before the subspace split, chosen as the PCA basis with
    eigenvalue-BALANCED dimension allocation — correlated/anisotropic
    dimensions get decorrelated and the per-subspace variance products
    equalize, so each of the ``m`` byte budgets quantizes an equal share
    of the data's energy. Rotations preserve inner products, so the ADC
    score still estimates the cosine directly and every search surface
    (``search``, ``search_many``, ``ivfadc_search``/``_many``,
    ``search_rerank``) is inherited unchanged: the query is rotated
    inside ``_lut`` and the data inside ``encode``, nothing downstream
    knows the difference.

    On isotropic data OPQ degenerates to plain PQ (the rotation is just
    a basis change of equal-variance directions); it pays off when the
    spectrum is skewed or correlations straddle subspace boundaries —
    the usual shape of real embedding models (measured: 2.1x tighter ADC
    error on a mixed geometric variance ladder, m=8/ks=16/d=32).
    Serialization is PQO1 = header +
    (d, d) float32 rotation + codebooks; the rotation is code semantics
    exactly like the codebooks."""

    def __init__(self, m: int = 8, ks: int = 256, iters: int = 12,
                 seed: int = 7):
        super().__init__(m=m, ks=ks, iters=iters, seed=seed)
        self.rotation: np.ndarray | None = None  # (d, d) f64, rows=dirs

    # -- training --------------------------------------------------------
    def fit(self, df, vec_col: str, sample_size: int = 20_000,
            cov: np.ndarray | None = None) -> "OPQCodec":
        """PCA + eigenvalue allocation, then per-subspace Lloyd on the
        ROTATED sample. The rotation is d x d driver floats (16 KB at
        d=64, 2.3 MB at d=768) — always driver/broadcast-sized.

        By default the covariance comes from the same Arrow-gathered
        sample the codebooks train on. Pass ``cov=`` to use a
        WHOLE-CORPUS covariance instead — e.g. the FrequentDirections
        sketch's ``cov_estimate(state)`` (sketches/fd.py): FD states are
        mergeable and one pass over 10^12 vectors yields a d x d Gram
        whose spectral error is certified, so the rotation reflects the
        full spectrum while only the quantization cells come from the
        sample. (Feed the FD sketch the same normalization the codec
        sees — unit vectors — for exact agreement; eigh of a rank-ell
        sketch Gram still yields a full orthonormal basis, the null
        directions carrying interchangeable near-zero eigenvalues.)"""
        x = _gather_unit_sample(df, vec_col, sample_size, self.seed,
                                self.m, "OPQ")
        d = x.shape[1]
        if cov is None:
            cov = (x.T @ x) / len(x)
        else:
            cov = np.asarray(cov, dtype=np.float64)
            if cov.shape != (d, d):
                raise ValueError(
                    f"cov shape {cov.shape} != ({d}, {d}) for dim-{d} vectors"
                )
        evals, evecs = np.linalg.eigh(cov)  # ascending, orthonormal cols
        perm = _eigen_allocation(evals, self.m)
        rot = evecs[:, perm].T  # rows = principal dirs in subspace layout
        # float32 at the training boundary like the codebooks: encode
        # broadcasts f32, and to_bytes stays lossless
        self.rotation = rot.astype(np.float32).astype(np.float64)
        y = x @ self.rotation.T
        xs = y.reshape(len(x), self.m, d // self.m)
        rng = np.random.default_rng(self.seed)
        ks = min(self.ks, len(x))
        cb = _fit_subspace_codebooks(xs, ks, self.iters, rng)
        self.codebooks = cb.astype(np.float32).astype(np.float64)
        _drop_stale_broadcast(self)
        return self

    # -- encode ----------------------------------------------------------
    def _codebook_broadcast(self, df):
        # ships (codebooks, rotation) — both are code semantics
        sc = df.sparkSession.sparkContext
        bcast = getattr(self, "_bcast", None)
        if bcast is None or getattr(self, "_bcast_sc", None) is not sc:
            bcast = sc.broadcast(
                (
                    np.ascontiguousarray(self.codebooks, dtype=np.float32),
                    np.ascontiguousarray(self.rotation, dtype=np.float32),
                )
            )
            self._bcast = bcast
            self._bcast_sc = sc
        return bcast

    def encode(self, df, vec_col: str, out_col: str = "pq_code"):
        """Rotate-then-quantize, still ONE zero-shuffle arrow_udf
        projection (the rotation is a per-batch (n, d) @ (d, d) matmul
        ahead of the same subspace argmin)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BinaryType

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        bcast = self._codebook_broadcast(df)
        _enc = arrow_udf(_make_opq_encode_fn(bcast, self.m), BinaryType())
        return df.withColumn(out_col, _enc(vec_col))

    def rotate(self, df, vec_col: str, out_col: str | None = None):
        """Materialize the rotated (and normalized) vectors as a column
        — the composition hook for the full OPQ+IVFADC stack: rotate
        ONCE at ingest, then fit/assign the ``IVFIndex`` and a
        ``ResidualPQ`` (or any codec) on the rotated column. Queries on
        that stack must be rotated the same way
        (``rotate_query``). One zero-shuffle arrow_udf projection;
        rotation preserves inner products, so cosine results over the
        rotated space equal the originals."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import ArrayType, FloatType

        if self.rotation is None:
            raise RuntimeError("fit() first")
        bcast = self._codebook_broadcast(df)

        def _rot(v: pa.Array) -> pa.Array:
            _, rot = bcast.value
            x = _normalize_rows(_list_col_to_matrix(v, np.float32))
            n = len(x)
            if n == 0:
                return pa.ListArray.from_arrays(
                    pa.array(np.zeros(1, dtype=np.int32)),
                    pa.array(np.empty(0, dtype=np.float32), type=pa.float32()),
                )
            if x.shape[1] != rot.shape[0]:
                raise ValueError(
                    f"vector dim {x.shape[1]} != rotation dim {rot.shape[0]}"
                )
            y = np.ascontiguousarray(x @ rot.T)
            d = y.shape[1]
            offs = pa.array(
                np.arange(0, (n + 1) * d, d, dtype=np.int32), type=pa.int32()
            )
            return pa.ListArray.from_arrays(
                offs, pa.array(y.reshape(-1), type=pa.float32())
            )

        _rotate = arrow_udf(_rot, ArrayType(FloatType()))
        return df.withColumn(out_col or vec_col, _rotate(vec_col))

    def rotate_query(self, query: np.ndarray) -> np.ndarray:
        """The query-side counterpart of ``rotate``: unit-normalize and
        rotate one vector (driver-side, d x d matvec)."""
        if self.rotation is None:
            raise RuntimeError("fit() first")
        return self.rotation @ _unit(query)

    # -- search ----------------------------------------------------------
    def _lut(self, query: np.ndarray) -> np.ndarray:
        # rotate the normalized query into code space; R is orthogonal so
        # <Rq, Rx> = <q, x> and the inherited ADC scan needs no changes
        return _query_lut(
            self.codebooks, self.m, self.rotation @ _unit(query)
        )

    # -- persistence -------------------------------------------------------
    def to_bytes(self) -> bytes:
        """PQO1 header + float32 rotation + float32 codebook bytes."""
        if self.codebooks is None:
            raise RuntimeError("fit() first")
        m, ks, dsub = self.codebooks.shape
        hdr = _HDR.pack(_MAGIC_O, m, ks, dsub, self.iters, self.seed)
        return (
            hdr
            + np.ascontiguousarray(self.rotation, dtype=np.float32).tobytes()
            + np.ascontiguousarray(self.codebooks, dtype=np.float32).tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "OPQCodec":
        magic, m, ks, dsub, iters, seed = _HDR.unpack_from(data, 0)
        if magic != _MAGIC_O:
            raise ValueError(f"bad OPQ codec magic {magic!r}")
        d = m * dsub
        body = np.frombuffer(data, dtype=np.float32, offset=_HDR.size)
        if body.size != d * d + m * ks * dsub:
            raise ValueError("OPQ codec byte length does not match header")
        codec = cls(m=m, ks=ks, iters=iters, seed=seed)
        codec.rotation = body[: d * d].reshape(d, d).astype(np.float64)
        codec.codebooks = (
            body[d * d :].reshape(m, ks, dsub).astype(np.float64)
        )
        return codec


class ResidualPQ:
    """Residual product quantization — IVFADC proper (Jegou, Douze &
    Schmid 2011 §V): codes quantize the RESIDUAL ``x - c_cid`` of each
    (normalized) vector against its assigned IVF centroid, not the raw
    vector. Residuals concentrate near the origin, so the same ``m``
    bytes spend their resolution on a much smaller cell — reconstruction
    error (and hence ADC ranking error) drops versus raw-vector PQ on
    clustered data (tested).

    Cosine/IP makes the bucket coupling cheap: ``<q, x> ≈ <q, c_cid> +
    sum_j LUT[j, code_j]`` — ONE LUT for all buckets (identical to raw
    PQ) plus a per-bucket scalar bias ``<q, c_i>``, so scoring stays a
    byte gather + one float add. (Under L2 the LUT would be per-probed
    bucket; the cosine contract avoids that entirely.)

    The centroid set is PART of the code semantics: ``to_bytes`` embeds
    sha256 of the float32 centroid matrix and ``from_bytes`` refuses a
    mismatched index — the same refuse-don't-adapt contract as
    ``IncrementalANN``'s centroid pin. ``score``/``search`` therefore
    require the centroid-id column (``needs_centroid = True``);
    ``ivfadc_search``/``ivfadc_search_many`` carry it automatically.
    """

    needs_centroid = True

    def __init__(self, index, m: int = 8, ks: int = 256, iters: int = 12,
                 seed: int = 7):
        if not (2 <= ks <= 256):
            raise ValueError("ks must be in [2, 256] (codes are uint8)")
        if getattr(index, "centroids", None) is None:
            raise ValueError("index must be a fitted IVFIndex")
        self.index = index
        self.m = int(m)
        self.ks = int(ks)
        self.iters = int(iters)
        self.seed = int(seed)
        self.codebooks: np.ndarray | None = None  # (m, ks_eff, dsub) f64

    def _cent32(self) -> np.ndarray:
        return np.ascontiguousarray(self.index.centroids, dtype=np.float32)

    # -- training --------------------------------------------------------
    def fit(self, df, vec_col: str, sample_size: int = 20_000) -> "ResidualPQ":
        """Train per-subspace codebooks on the RESIDUALS of an
        Arrow-gathered sample. Assignment uses the same float32 CENTROID
        precision as ``IVFIndex.assign``; the sample itself is
        normalized in float64 (the shared gather contract), so a vector
        whose top-2 centroid scores tie within ~1 ulp of float32 can
        land in the other cell than assign() puts it — accuracy noise on
        the trained codebooks only, never a code/score mismatch (codes
        always quantize against the cid column the caller provides)."""
        x = _gather_unit_sample(df, vec_col, sample_size, self.seed,
                                self.m, "residual PQ")
        d = x.shape[1]
        cent = self._cent32()
        if cent.shape[1] != d:
            raise ValueError(
                f"vector dim {d} != index centroid dim {cent.shape[1]}"
            )
        a = _chunked_argmax_scores(
            x.astype(np.float32), np.ascontiguousarray(cent.T)
        )
        r = x - cent[a].astype(np.float64)
        xs = r.reshape(len(x), self.m, d // self.m)
        rng = np.random.default_rng(self.seed)
        ks = min(self.ks, len(x))
        cb = _fit_subspace_codebooks(xs, ks, self.iters, rng)
        # float32 at the training boundary, same rationale as PQCodec:
        # to_bytes is lossless, fitted == deserialized bit-for-bit
        self.codebooks = cb.astype(np.float32).astype(np.float64)
        _drop_stale_broadcast(self)
        return self

    # -- encode ----------------------------------------------------------
    def _state_broadcast(self, df):
        # one broadcast per fitted codec carrying (codebooks, centroids)
        # float32, session-keyed like PQCodec/IVFIndex
        sc = df.sparkSession.sparkContext
        bcast = getattr(self, "_bcast", None)
        if bcast is None or getattr(self, "_bcast_sc", None) is not sc:
            bcast = sc.broadcast(
                (
                    np.ascontiguousarray(self.codebooks, dtype=np.float32),
                    self._cent32(),
                )
            )
            self._bcast = bcast
            self._bcast_sc = sc
        return bcast

    def encode(self, df, vec_col: str, centroid_col: str = "centroid_id",
               out_col: str = "pq_code"):
        """Add the m-byte residual-PQ code column. ``df`` must already
        carry the centroid-id column from ``index.assign`` (the
        IncrementalANN append path and ``IVFIndex.assign`` output both
        do). Still ONE arrow_udf projection, zero shuffle."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BinaryType

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        bcast = self._state_broadcast(df)
        _enc = arrow_udf(_make_residual_encode_fn(bcast, self.m), BinaryType())
        return df.withColumn(out_col, _enc(vec_col, centroid_col))

    # -- search ----------------------------------------------------------
    def _lut(self, query: np.ndarray) -> np.ndarray:
        return _query_lut(self.codebooks, self.m, _unit(query))

    def _bias(self, query: np.ndarray) -> np.ndarray:
        """(n_centroids,) float32 per-bucket bias ``<q_hat, c_i>``."""
        q32 = _unit(query).astype(np.float32)
        return (self._cent32() @ q32).astype(np.float32)

    def score(self, encoded_df, query: np.ndarray, code_col: str = "pq_code",
              out_col: str = "pq_score", centroid_col: str = "centroid_id"):
        """ADC approximate-cosine column for one query: LUT gather-sum
        plus the per-bucket bias. LUT + bias ship in the task closure
        (LUT <= 96 KB as in PQCodec; bias is 4 B/centroid — at the
        auto-sqrt(n) operating point slice it to the probe union first,
        which ``ivfadc_search`` does by construction via its bucket
        filter)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import FloatType

        if self.codebooks is None:
            raise RuntimeError("fit() first")
        lut = self._lut(query)
        bias = self._bias(query)
        m = self.m
        j_idx = np.arange(m)[None, :]

        def _adc(codes: pa.Array, cid: pa.Array) -> pa.Array:
            c = _binary_col_to_codes(codes, m)
            if len(c) == 0:
                return pa.array(np.empty(0, dtype=np.float32), type=pa.float32())
            if isinstance(cid, pa.ChunkedArray):
                cid = cid.combine_chunks()
            ci = cid.to_numpy(zero_copy_only=False).astype(np.int64)
            if ci.min() < 0 or ci.max() >= len(bias):
                raise ValueError(
                    f"centroid id out of range [0, {len(bias)}) in score"
                )
            return pa.array(
                lut[j_idx, c].sum(axis=1) + bias[ci], type=pa.float32()
            )

        return encoded_df.withColumn(
            out_col, arrow_udf(_adc, FloatType())(code_col, centroid_col)
        )

    def search(self, encoded_df, query: np.ndarray, k: int = 10,
               code_col: str = "pq_code", centroid_col: str = "centroid_id"):
        """ADC top-k over (already probe-filtered) encoded rows — same
        shape as ``PQCodec.search`` plus the bias column read. Prefer
        ``ivfadc_search(index, codec, ...)`` which applies the probe
        filter for you."""
        from pyspark.sql import functions as F

        scored = self.score(
            encoded_df, query, code_col=code_col, centroid_col=centroid_col
        )
        return scored.orderBy(F.desc("pq_score")).limit(k)

    # -- persistence -------------------------------------------------------
    def to_bytes(self) -> bytes:
        """PQR1 header + centroid sha256 + float32 codebook bytes."""
        if self.codebooks is None:
            raise RuntimeError("fit() first")
        m, ks, dsub = self.codebooks.shape
        hdr = _HDR.pack(_MAGIC_R, m, ks, dsub, self.iters, self.seed)
        sha = hashlib.sha256(self._cent32().tobytes()).digest()
        return hdr + sha + np.ascontiguousarray(
            self.codebooks, dtype=np.float32
        ).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, index) -> "ResidualPQ":
        """Rehydrate against ``index`` — REFUSES (never adapts) if the
        index's centroid set is not the one the codes were trained
        against; residual codes under another centroid set are garbage
        that would silently scan as valid scores."""
        magic, m, ks, dsub, iters, seed = _HDR.unpack_from(data, 0)
        if magic != _MAGIC_R:
            raise ValueError(f"bad residual PQ codec magic {magic!r}")
        sha = bytes(data[_HDR.size : _HDR.size + 32])
        cent = np.ascontiguousarray(index.centroids, dtype=np.float32)
        want = hashlib.sha256(cent.tobytes()).digest()
        if sha != want:
            raise ValueError(
                "residual PQ codec was trained against a different "
                "centroid set than the given index; refusing to decode "
                "(codes would silently misscore)"
            )
        body = np.frombuffer(data, dtype=np.float32, offset=_HDR.size + 32)
        if body.size != m * ks * dsub:
            raise ValueError("PQ codec byte length does not match header")
        codec = cls(index, m=m, ks=ks, iters=iters, seed=seed)
        codec.codebooks = body.reshape(m, ks, dsub).astype(np.float64)
        return codec

    __getstate__ = _getstate_without_broadcast


def codec_from_bytes(data: bytes, index=None):
    """Magic-dispatching codec decode: PQC1 -> ``PQCodec`` (standalone),
    PQO1 -> ``OPQCodec`` (standalone), SQ81 -> ``SQ8Codec``
    (standalone), PQR1 -> ``ResidualPQ`` (requires the index whose
    centroids the codes were trained against — sha-checked)."""
    magic = bytes(data[:4])
    if magic == _MAGIC:
        return PQCodec.from_bytes(data)
    if magic == _MAGIC_O:
        return OPQCodec.from_bytes(data)
    if magic == _MAGIC_S:
        return SQ8Codec.from_bytes(data)
    if magic == _MAGIC_R:
        if index is None:
            raise ValueError(
                "PQR1 residual codec requires the owning IVF index"
            )
        return ResidualPQ.from_bytes(data, index)
    raise ValueError(f"unknown PQ codec magic {magic!r}")


def ivfadc_search_many(index, codec: PQCodec, encoded_df, queries,
                       k: int = 10, centroid_col: str = "centroid_id",
                       code_col: str = "pq_code", id_col: str = "vec_id",
                       rerank: int = 0, vec_col: str | None = None):
    """Batched IVFADC: ONE scan of the UNION of all queries' probe
    buckets (the IN-filter still prunes directories), each query scored
    only against its OWN probe set via a UNION-LOCAL (Q, U) mask inside
    the kernel (U <= Q*nprobe — never (Q, n_centroids), which is 256 MB
    of closure per task at the auto sqrt(n) operating point), per-batch
    partial top-k, one Q*k-row global reduce — ``search_many``'s serving
    shape composed with the IVF funnel. Works for both ``PQCodec`` and
    ``ResidualPQ`` (the residual codec's per-bucket bias is gathered to
    the same (Q, U) columns and folded into the chunk loop). Returns ``DataFrame[qid int, <id_col>, pq_score
    float]``; per-query rows match the single-query
    ``ivfadc_search(..., rerank=0)`` (tested).

    ``rerank > 0`` (requires ``vec_col``) is the batched two-phase
    funnel: phase 1 is this byte-only ADC scan at k*rerank candidates
    per query; phase 2 is ONE ``id IN (union of candidates)`` re-read of
    the probe buckets (parquet-pushed), Arrow-gathered to the driver
    (Q*k*rerank rows of d floats — ~650 KB at 64 queries / k=10 /
    rerank=4 / d=64, always driver-tiny), and the exact per-query cosine
    rerank is one numpy matmul. Returns ``DataFrame[qid int, <id_col>,
    cosine float]`` with k rows per query, matching the single-query
    ``ivfadc_search(..., rerank=r)`` per query."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if codec.codebooks is None:
        raise RuntimeError("fit() first")
    if rerank > 0:
        if vec_col is None:
            raise ValueError(
                "rerank requires vec_col (exact-cosine refine re-fetches "
                "candidate rows by id)"
            )
        byte_only = encoded_df.select(id_col, code_col, centroid_col)
        cand_tbl = ivfadc_search_many(
            index, codec, byte_only, queries, k=k * rerank,
            centroid_col=centroid_col, code_col=code_col, id_col=id_col,
        ).toArrow()  # Q*k*rerank rows: Arrow, never Row objects
        cand_qids = cand_tbl.column("qid").to_pylist()
        cand_ids = cand_tbl.column(id_col).to_pylist()
        per_q: dict[int, list] = {}
        for cq, ci in zip(cand_qids, cand_ids):
            per_q.setdefault(cq, []).append(ci)
        union_ids = sorted(set(cand_ids))
        probe_union = np.unique(
            np.concatenate(
                [np.asarray(index.probe_ids(q)) for q in queries]
            )
        ).tolist()
        bucketed = encoded_df.filter(F.col(centroid_col).isin(probe_union))
        spark = encoded_df.sparkSession
        id_type = encoded_df.schema[id_col].dataType.simpleString()
        if len(union_ids) > _RERANK_IN_THRESHOLD:
            # a literal IN list of Q*k*rerank ids (128K at Q=256, k=10,
            # rerank=50) explodes the Catalyst expression tree — the
            # driver OOMs before the scan starts. Past ~1K ids the
            # candidate set rides a broadcast semi-join instead; below
            # it the IN filter keeps its parquet pushdown.
            id_df = spark.createDataFrame(
                [(i,) for i in union_ids], f"{id_col} {id_type}"
            )
            bucketed = bucketed.join(
                F.broadcast(id_df), id_col, "left_semi"
            )
        else:
            bucketed = bucketed.filter(F.col(id_col).isin(union_ids))
        fetched = bucketed.select(id_col, vec_col).toArrow()
        ids_arr = fetched.column(0).to_pylist()
        vecs = _normalize_rows(
            _list_col_to_matrix(fetched.column(1), np.float64)
        )
        by_id = {i: j for j, i in enumerate(ids_arr)}
        rows = []
        for qi, q in enumerate(queries):
            qn = _unit(q)
            cids = [c for c in per_q.get(qi, []) if c in by_id]
            if not cids:
                continue
            cos = vecs[[by_id[c] for c in cids]] @ qn
            order = np.argsort(-cos)[:k]
            rows.extend(
                (qi, cids[j], float(cos[j])) for j in order
            )
        return spark.createDataFrame(
            rows, f"qid int, {id_col} {id_type}, cosine float"
        )
    nq, m = len(queries), codec.m
    n_cent = index.centroids.shape[0]
    # per-query probe masks live in UNION-LOCAL coordinates: the task
    # closure carries (Q, U) with U <= Q*nprobe, never (Q, n_centroids)
    # — at the auto sqrt(n) operating point (10^6 centroids) a dense
    # (Q, n_cent) bool mask is 256 MB per task at Q=256, and the
    # residual bias matrix in the same shape is 1 GB of float32
    probe_lists = [
        np.sort(np.asarray(index.probe_ids(q), dtype=np.int64))
        for q in queries
    ]
    union_arr = np.unique(np.concatenate(probe_lists))
    union = union_arr.tolist()
    mask_u = np.zeros((nq, len(union_arr)), dtype=bool)
    for qi, pl in enumerate(probe_lists):
        mask_u[qi, np.searchsorted(union_arr, pl)] = True
    luts = np.stack([codec._lut(q) for q in queries])
    bias_u = (
        # gather each (n_cent,) bias down to the union columns one query
        # at a time — the full-width vector is transient per query, the
        # stacked closure is (Q, U) f32
        np.stack([codec._bias(q)[union_arr] for q in queries])
        if getattr(codec, "needs_centroid", False)
        else None
    )
    j_idx = np.arange(m)[None, :]
    id_type = encoded_df.schema[id_col].dataType.simpleString()

    def _topk(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            codes = _binary_col_to_codes(b.column(1), m)
            cids = b.column(2).to_numpy(zero_copy_only=False)
            nb = len(codes)
            if nb == 0:
                continue
            # remap centroid ids to union-local columns; the pre-filter
            # restricts rows to union buckets, so a miss here is a
            # malformed store, not a routine case
            loc = np.searchsorted(union_arr, cids)
            loc_c = np.minimum(loc, len(union_arr) - 1)
            if not np.array_equal(union_arr[loc_c], cids):
                raise ValueError(
                    "centroid id outside the probed bucket union in "
                    "batched search"
                )
            rows = max(1, _SCORE_CHUNK_ELEMS // max(1, nq * m))
            scores = np.empty((nq, nb), dtype=np.float32)
            for lo in range(0, nb, rows):
                hi = min(nb, lo + rows)
                scores[:, lo:hi] = luts[:, j_idx, codes[lo:hi]].sum(axis=2)
                if bias_u is not None:
                    scores[:, lo:hi] += bias_u[:, loc_c[lo:hi]]
            scores[~mask_u[:, loc_c]] = -np.inf  # outside this query's probes
            kk = min(k, nb)
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out_q, out_i, out_s = [], [], []
            for qi in range(nq):
                s = scores[qi, part[qi]]
                keep = np.isfinite(s)
                out_q.append(np.full(int(keep.sum()), qi, dtype=np.int32))
                out_i.append(ids[part[qi][keep]])
                out_s.append(s[keep])
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        id_col: np.concatenate(out_i),
                        "pq_score": np.concatenate(out_s),
                    }
                ),
                preserve_index=False,
            )

    partial = (
        encoded_df.filter(F.col(centroid_col).isin(union))
        .select(id_col, code_col, F.col(centroid_col).cast("int"))
        .mapInArrow(
            _topk, schema=f"qid int, {id_col} {id_type}, pq_score float"
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("pq_score"), F.asc(id_col))
    return (
        partial.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfadc_search(index, codec: PQCodec, encoded_df, query: np.ndarray,
                  k: int = 10, rerank: int = 0, vec_col: str | None = None,
                  id_col: str | None = None,
                  centroid_col: str = "centroid_id",
                  code_col: str = "pq_code"):
    """IVFADC (Jegou et al. 2011 §V): IVF bucket pruning composed with the
    PQ byte scan. ``encoded_df`` carries ``index.assign``'s centroid ids
    AND ``codec.encode``'s codes (write it partitioned by the centroid
    column so the IN-filter prunes directories); the probe ranking is
    ``index.probe_ids`` — identical bucket set to the exact ``search``.

    ``rerank == 0`` returns the ADC top-k in one scan; the scan reads
    whatever columns ``encoded_df`` carries, so pass a projection without
    the float column to keep it byte-only.

    ``rerank > 0`` (requires ``vec_col`` AND ``id_col``) runs the honest
    two-phase funnel: phase 1 scans ONLY (id, code) — the float column
    never enters the plan — and collects the top ``k*rerank`` candidate
    ids (driver-tiny); phase 2 re-reads the probe buckets with an
    ``id IN (...)`` filter (pushed to parquet, so row-group stats skip
    everything else) and reranks those rows by exact JVM-side cosine. A
    single-phase orderBy-then-rerank plan would drag the float column
    through the whole probe-bucket scan via TakeOrderedAndProject,
    silently paying 256 B/vector where 8 suffice — measured wrong-shape,
    hence the explicit phase split. At 10^12 vectors: directory pruning
    cuts the corpus to ~nprobe/n_centroids, the byte scan cuts the read
    to m bytes/vector, floats surface for ~k*rerank rows."""
    from pyspark.sql import functions as F

    q = np.asarray(query, dtype=np.float64)
    probe = index.probe_ids(q)
    bucketed = encoded_df.filter(F.col(centroid_col).isin(probe))
    needs_cent = getattr(codec, "needs_centroid", False)

    def _score(df):
        if needs_cent:  # ResidualPQ: per-bucket bias needs the cid column
            return codec.score(
                df, q, code_col=code_col, centroid_col=centroid_col
            )
        return codec.score(df, q, code_col=code_col)

    if rerank == 0:
        scored = _score(bucketed)
        return scored.orderBy(F.desc("pq_score")).limit(k)
    if vec_col is None or id_col is None:
        raise ValueError(
            "rerank requires vec_col and id_col (exact-cosine refine "
            "re-fetches candidate rows by id)"
        )
    phase1_cols = [id_col, code_col] + ([centroid_col] if needs_cent else [])
    cand = _score(
        bucketed.select(*phase1_cols)
    ).orderBy(F.desc("pq_score")).limit(k * rerank)
    ids = [r[id_col] for r in cand.select(id_col).collect()]
    return (
        bucketed.filter(F.col(id_col).isin(ids))
        .withColumn("cosine", _cosine_expr(vec_col, q))
        .orderBy(F.desc("cosine"))
        .limit(k)
    )
