"""Bloom filter (membership pre-check; reference use-case README.md:10 —
"usable as a static bloom filter" — and the xor-filter evaluator
``src/main/c/filter/xor.c:118-128`` re-expressed as a mergeable bitmap).

State: m-bit bitmap (packed uint8). k probes via double hashing from one
xxhash64. Merge = bitwise OR. No false negatives; false-positive rate
(1 - e^{-kn/m})^k for n inserted keys (published bound, asserted by tests).
Sizing: m = ceil(-n ln fpr / ln(2)^2), k = max(1, round(m/n ln 2)).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pyarrow as pa
import pandas as pd

from ..hashing import mix64
from .base import MergeableSketch

_HDR = struct.Struct("<4sQB")
_MAGIC = b"BLM1"
# Sparse form (round 4): a filter sized for the global key universe but
# serialized per group (states_by_key / profile_by_key) is nearly all
# zero bytes for small groups. BLS1 writes (byte-index, byte) pairs when
# smaller; dense BLM1 bytes are still read. The byte-index dtype is
# derived from the bitmap byte length (uint32 below 2^32).
_MAGIC_SPARSE = b"BLS1"
_SP_N = struct.Struct("<I")


def _probe_positions(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch-Mitzenmacher double hashing."""
    h1 = np.ascontiguousarray(h, dtype=np.int64)
    h2 = mix64(h1.view(np.uint64)).view(np.int64) | np.int64(1)
    j = np.arange(k, dtype=np.int64)[:, None]
    mixed = h1[None, :] + j * h2[None, :]
    pos = mixed % np.int64(m)
    pos[pos < 0] += m
    return pos


class BloomFilter(MergeableSketch):
    input_kind = "hash"
    elementwise_update = True  # bit-or is per-element

    def __init__(self, n_expected: int, fpr: float = 0.01) -> None:
        if n_expected <= 0:
            raise ValueError("n_expected must be positive")
        self.n_expected = n_expected
        self.fpr = fpr
        self.m = max(64, int(math.ceil(-n_expected * math.log(fpr) / math.log(2) ** 2)))
        self.k = max(1, round(self.m / n_expected * math.log(2)))

    def approx_state_bytes(self) -> int:
        return _HDR.size + (self.m + 7) // 8

    def expected_fpr(self, n_inserted: int) -> float:
        return (1.0 - math.exp(-self.k * n_inserted / self.m)) ** self.k

    # -- monoid ---------------------------------------------------------------
    def new_state(self) -> np.ndarray:
        return np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def update(self, state: np.ndarray, arr: np.ndarray) -> None:
        if len(arr) == 0:
            return
        # chunk so the (k x batch) probe-position matrix stays cache-sized
        # instead of streaming DRAM (same discipline as HLL/CMS updates);
        # bit-or commutes, so chunking is bit-identical
        chunk = max(4096, (1 << 19) // self.k)
        if len(arr) > chunk:
            for i in range(0, len(arr), chunk):
                self.update(state, arr[i : i + chunk])
            return
        pos = _probe_positions(arr, self.k, self.m).ravel()
        np.bitwise_or.at(state, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a | b

    def _idx_dtype(self):
        return np.uint32 if (self.m + 7) // 8 < (1 << 32) else np.uint64

    def to_bytes(self, state: np.ndarray) -> bytes:
        nz = np.flatnonzero(state)
        idx_isz = np.dtype(self._idx_dtype()).itemsize
        sparse_len = _SP_N.size + nz.size * (idx_isz + 1)
        if sparse_len < state.size:
            return (
                _HDR.pack(_MAGIC_SPARSE, self.m, self.k)
                + _SP_N.pack(nz.size)
                + nz.astype(self._idx_dtype()).tobytes()
                + state[nz].tobytes()
            )
        return _HDR.pack(_MAGIC, self.m, self.k) + state.tobytes()

    def from_bytes(self, data: bytes) -> np.ndarray:
        magic, m, k = _HDR.unpack_from(data, 0)
        if magic not in (_MAGIC, _MAGIC_SPARSE) or (m, k) != (self.m, self.k):
            raise ValueError("Bloom state mismatch")
        if magic == _MAGIC:
            return np.frombuffer(data, dtype=np.uint8, offset=_HDR.size).copy()
        (nnz,) = _SP_N.unpack_from(data, _HDR.size)
        off = _HDR.size + _SP_N.size
        idx_dt = self._idx_dtype()
        idx = np.frombuffer(data, dtype=idx_dt, count=nnz, offset=off)
        vals = np.frombuffer(
            data, dtype=np.uint8, count=nnz, offset=off + nnz * np.dtype(idx_dt).itemsize
        )
        state = np.zeros((self.m + 7) // 8, dtype=np.uint8)
        state[idx] = vals
        return state

    # -- queries ----------------------------------------------------------------
    def contains_hashes(self, state: np.ndarray, h: np.ndarray) -> np.ndarray:
        pos = _probe_positions(h, self.k, self.m)  # (k, n)
        bits = (state[pos >> 3] >> (pos & 7).astype(np.uint8)) & np.uint8(1)
        return bits.all(axis=0)

    def might_contain(self, df, col: str, state: np.ndarray, out_col: str = "might_contain"):
        """Append a boolean membership column (broadcast filter, JVM-side
        hashing — the classic semi-join pre-filter at scale)."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BooleanType

        sk = self
        # broadcast the bit array itself — deserialized once per executor
        # process; no per-batch from_bytes copy. Arrow-native UDF: the
        # probe is pure int64/bit array math (no pandas wrapping tax).
        bcast = df.sparkSession.sparkContext.broadcast(np.ascontiguousarray(state))

        @arrow_udf(BooleanType())
        def _q(h: pa.Array) -> pa.Array:
            hs = h.to_numpy(zero_copy_only=False)
            return pa.array(sk.contains_hashes(bcast.value, hs))

        return df.withColumn(out_col, _q(F.xxhash64(F.col(col).cast("string"))))
