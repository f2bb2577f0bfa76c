"""Count-min sketch (Cormode & Muthukrishnan 2005).

State: (d x w) int64 counters. Row i uses the double-hashing family
h_i(x) = (h1(x) + i * h2(x)) mod w (Kirsch-Mitzenmacher), both derived from
the one JVM-side xxhash64. Merge = elementwise add. Point-query guarantee:
  true <= est <= true + eps * N  with prob >= 1 - delta,
for w = ceil(e / eps), d = ceil(ln(1 / delta)) — asserted by tests.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pyarrow as pa
import pandas as pd

from ..hashing import mix64, reduce_to
from .base import MergeableSketch

_HDR = struct.Struct("<4sII")
# CMS2: the column mapping switched from 64-bit modulo to the Lemire reduce,
# so states serialized under CMS1 occupy an incompatible layout; the magic
# bump makes from_bytes reject them instead of merging wrong estimates.
_MAGIC = b"CMS2"
# CMS3 (round 4): compact encoding — counts are downcast to the smallest
# unsigned dtype that holds the state's max, and when few counters are
# nonzero (the per-key grouped-profiling regime: most groups see a handful
# of items while w is sized for the global stream) the state is written as
# (flat-index, count) pairs instead of the d*w matrix. Layout after the
# CMS3 header: mode u8 (0 dense / 1 sparse), dtype-code u8 (log2 of the
# count item size), then the payload. The flat-index dtype is derived from
# d*w (uint32 below 2^32). CMS2 dense-int64 bytes (rounds 1-3) are still
# read; in-memory state and kernels are unchanged (int64 d x w).
_MAGIC_C = b"CMS3"
_SP_N = struct.Struct("<I")
_COUNT_DTYPES = (np.uint8, np.uint16, np.uint32, np.int64)


def _rows_cols(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) column indices for hashes ``h`` via double hashing.

    Column = Lemire multiply-shift reduce of (h1 + i*h2) — 64-bit modulo has
    no SIMD path in numpy (measured 20x slower than the reduce)."""
    h1 = np.ascontiguousarray(h, dtype=np.int64)
    h2 = mix64(h1.view(np.uint64)).view(np.int64) | np.int64(1)
    i = np.arange(d, dtype=np.int64)[:, None]
    mixed = h1[None, :] + i * h2[None, :]
    return reduce_to(mixed, w)


class CountMinSketch(MergeableSketch):
    input_kind = "hash"
    elementwise_update = True  # counter add is per-element

    def __init__(self, eps: float = 0.001, delta: float = 0.01) -> None:
        self.eps = eps
        self.delta = delta
        self.w = int(math.ceil(math.e / eps))
        self.d = int(math.ceil(math.log(1.0 / delta)))

    def approx_state_bytes(self) -> int:
        return _HDR.size + 8 * self.d * self.w

    # -- monoid ---------------------------------------------------------------
    def new_state(self) -> np.ndarray:
        return np.zeros((self.d, self.w), dtype=np.int64)

    # The (d x batch) column-index matrix is the DRAM hog (d=5 x 26M x 8 B
    # = 1 GB of temporaries per one-shot update); chunking keeps it
    # L2-resident (26M hashes: 3.44 s -> 1.05 s single-core on this box,
    # more under concurrency). Bit-identical: counter adds commute.
    _UPDATE_CHUNK = 1 << 16

    def update(self, state: np.ndarray, arr: np.ndarray) -> None:
        if len(arr) == 0:
            return
        if len(arr) > self._UPDATE_CHUNK:
            for i in range(0, len(arr), self._UPDATE_CHUNK):
                self.update(state, arr[i : i + self._UPDATE_CHUNK])
            return
        cols = _rows_cols(arr, self.d, self.w)
        for i in range(self.d):
            # bincount is ~10x np.add.at (buffered histogram vs ufunc.at)
            state[i] += np.bincount(cols[i], minlength=self.w)

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a + b

    def _idx_dtype(self):
        return np.uint32 if self.d * self.w < (1 << 32) else np.uint64

    def to_bytes(self, state: np.ndarray) -> bytes:
        flat = state.ravel()
        mx = int(flat.max(initial=0))
        code = next(
            i for i, dt in enumerate(_COUNT_DTYPES) if mx <= np.iinfo(dt).max
        )
        dt = _COUNT_DTYPES[code]
        isz = np.dtype(dt).itemsize
        nz = np.flatnonzero(flat)
        idx_isz = np.dtype(self._idx_dtype()).itemsize
        sparse_sz = _SP_N.size + nz.size * (idx_isz + isz)
        hdr = _HDR.pack(_MAGIC_C, self.d, self.w)
        if sparse_sz < flat.size * isz:
            return (
                hdr
                + bytes((1, code))
                + _SP_N.pack(nz.size)
                + nz.astype(self._idx_dtype()).tobytes()
                + flat[nz].astype(dt).tobytes()
            )
        return hdr + bytes((0, code)) + flat.astype(dt).tobytes()

    def from_bytes(self, data: bytes) -> np.ndarray:
        magic, d, w = _HDR.unpack_from(data, 0)
        if magic not in (_MAGIC, _MAGIC_C) or (d, w) != (self.d, self.w):
            raise ValueError("CMS state mismatch")
        if magic == _MAGIC:  # legacy dense int64
            return (
                np.frombuffer(data, dtype=np.int64, offset=_HDR.size)
                .reshape(d, w)
                .copy()
            )
        mode, code = data[_HDR.size], data[_HDR.size + 1]
        dt = _COUNT_DTYPES[code]
        off = _HDR.size + 2
        if mode == 0:
            return (
                np.frombuffer(data, dtype=dt, count=d * w, offset=off)
                .astype(np.int64)
                .reshape(d, w)
            )
        (nnz,) = _SP_N.unpack_from(data, off)
        off += _SP_N.size
        idx_dt = self._idx_dtype()
        idx = np.frombuffer(data, dtype=idx_dt, count=nnz, offset=off)
        counts = np.frombuffer(
            data, dtype=dt, count=nnz, offset=off + nnz * np.dtype(idx_dt).itemsize
        )
        flat = np.zeros(d * w, dtype=np.int64)
        flat[idx] = counts
        return flat.reshape(d, w)

    def total(self, state: np.ndarray) -> int:
        return int(state[0].sum())

    # -- inner product / join size ---------------------------------------------
    def inner_product_estimate(self, a: np.ndarray, b: np.ndarray) -> int:
        """Inner-product estimate min_i a[i]·b[i] (Cormode & Muthukrishnan
        2005 §4.2). For the frequency vectors fa, fb the two states
        summarize::

            fa·fb  <=  est  <=  fa·fb + eps * ||fa||_1 * ||fb||_1

        with probability >= 1 - delta. fa·fb is exactly the row count of
        the equi-join between the two streams on the sketched column, so
        this is the classic sketch join-size estimator; it is also exact
        whenever no two distinct values collide in some row. Works on any
        two states of the SAME (eps, delta) config — including states
        merged across partitions/batches (counter add is linear, so the
        estimate of a merged state is the estimate of the union stream).

        Row dot products are accumulated in Python ints when they could
        exceed int64 (counts near 1e12 square to ~1e24)."""
        if a.shape != (self.d, self.w) or b.shape != (self.d, self.w):
            raise ValueError("CMS state shape mismatch")
        best = None
        for i in range(self.d):
            mx = int(a[i].max(initial=0)) * int(b[i].max(initial=0))
            if mx * self.w < (1 << 62):
                v = int(np.dot(a[i], b[i]))
            else:
                v = int(np.multiply(
                    a[i].astype(object), b[i].astype(object)
                ).sum())
            if best is None or v < best:
                best = v
        return int(best)

    def inner_product_bound(self, total_a: int, total_b: int) -> float:
        """The one-sided overcount bound eps * ||fa||_1 * ||fb||_1 that
        holds with probability >= 1 - delta (totals come from
        ``total(state)``)."""
        return self.eps * float(total_a) * float(total_b)

    def f2_estimate(self, state: np.ndarray) -> int:
        """Second frequency moment (self-join size) upper estimate:
        F2 <= est <= F2 + eps * N^2 with probability >= 1 - delta."""
        return self.inner_product_estimate(state, state)

    def join_size_estimate(self, df_a, col_a: str, df_b=None,
                           col_b: str | None = None):
        """``(est, bound)`` for the equi-join row count between two key
        columns — one sketch build per side (sharing the library's
        xxhash64 contract), no join executed. ``df_b=None`` estimates the
        SELF-join size of ``df_a[col_a]`` (the second frequency moment)
        from a single state."""
        sa = self.build(df_a, col_a)
        if df_b is None:
            est = self.f2_estimate(sa)
            t = self.total(sa)
            return est, self.inner_product_bound(t, t)
        sb = self.build(df_b, col_b or col_a)
        est = self.inner_product_estimate(sa, sb)
        return est, self.inner_product_bound(self.total(sa), self.total(sb))

    # -- queries ----------------------------------------------------------------
    def query_hashes(self, state: np.ndarray, h: np.ndarray) -> np.ndarray:
        """Point-frequency estimates for int64 hashes."""
        cols = _rows_cols(h, self.d, self.w)
        ests = np.stack([state[i][cols[i]] for i in range(self.d)])
        return ests.min(axis=0)

    def frequencies(self, df, col: str, state: np.ndarray):
        """DataFrame[col, freq_est] for every distinct value of ``col``.

        Hashing happens JVM-side with the same expression used by
        ``update``, so driver code never re-implements xxhash64.
        """
        from pyspark.sql import functions as F
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import LongType

        sk = self
        # broadcast the counter matrix itself: bcast.value deserializes once
        # per executor process, so probe batches skip the per-batch
        # from_bytes copy (~d*w*8 bytes per batch at round 1). Arrow-native
        # UDF: pure int64 gather math, no pandas wrapping.
        bcast = df.sparkSession.sparkContext.broadcast(np.ascontiguousarray(state))

        @arrow_udf(LongType())
        def _q(h: pa.Array) -> pa.Array:
            hs = h.to_numpy(zero_copy_only=False)
            return pa.array(sk.query_hashes(bcast.value, hs), type=pa.int64())

        hashed = F.xxhash64(F.col(col).cast("string"))
        return df.select(col).distinct().withColumn("freq_est", _q(hashed))
