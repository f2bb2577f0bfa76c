"""HyperLogLog distinct-count sketch (dense, Flajolet et al. 2007).

State: m = 2^p uint8 registers. Register j = max rank of the (64-p)-bit
suffix among hashes whose top p bits equal j. Merge = elementwise max
(idempotent, commutative, associative). Relative standard error
1.04 / sqrt(m) (the published bound asserted by tests).

Reference analogue: the distinct-key machinery / Bloom-style use-case of
minperf (README.md:10, ``utils/RandomSetGenerator``); cross-checked in
tests against Spark built-ins ``approx_count_distinct`` /
``hll_sketch_agg``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import MergeableSketch

_HDR = struct.Struct("<4sB")
_MAGIC = b"HLL1"
# Sparse form (round 4): states are the shuffle currency of grouped
# profiling — at 10^12 rows a per-key ``states_by_key``/``profile_by_key``
# table holds G states, and a dense p=14 state is 16 KB even for a group
# with 3 distinct values. ``to_bytes`` writes (register, rank) pairs when
# that is smaller; dense HLL1 bytes (rounds 1-3, and any large state) are
# still read. The in-memory state, update/merge kernels, and estimates are
# unchanged — the encoding is chosen per state at serialization time, so
# the choice is invisible to merge order (same state -> same bytes).
_MAGIC_SPARSE = b"HLS1"
_SP_N = struct.Struct("<I")


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog(MergeableSketch):
    input_kind = "hash"
    elementwise_update = True  # register max is per-element

    def __init__(self, p: int = 14) -> None:
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p

    @property
    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def approx_state_bytes(self) -> int:
        return _HDR.size + self.m

    # -- monoid ---------------------------------------------------------------
    def new_state(self) -> np.ndarray:
        return np.zeros(self.m, dtype=np.uint8)

    # The rank computation allocates ~8 batch-sized temporaries; chunking
    # keeps them L2-resident instead of streaming DRAM (this box: 26M
    # hashes 1.43 s one-shot -> 0.40 s chunked single-core, and the gap
    # widens under executor concurrency on the shared ~9 GB/s bus).
    # Bit-identical by elementwise-ness (register max).
    _UPDATE_CHUNK = 1 << 16

    def update(self, state: np.ndarray, arr: np.ndarray) -> None:
        if len(arr) == 0:
            return
        if len(arr) > self._UPDATE_CHUNK:
            for i in range(0, len(arr), self._UPDATE_CHUNK):
                self.update(state, arr[i : i + self._UPDATE_CHUNK])
            return
        h = np.ascontiguousarray(arr, dtype=np.int64)
        p = self.p
        idx = (h >> (64 - p)) & np.int64(self.m - 1)  # top p bits
        # rank = leading zeros of the low (64-p)-bit suffix + 1, capped
        w = h & np.int64((1 << (64 - p)) - 1)
        # exact floor(log2): the suffix can reach 2^60 > 2^53, so a single
        # float64 cast rounds (w = 2^k - tiny rounds UP across the power of
        # two). Split into 32-bit halves — each casts exactly — and read the
        # IEEE-754 exponent field directly (no libm ulp concerns either).
        hi = (w >> np.int64(32)).astype(np.float64)
        lo = (w & np.int64(0xFFFFFFFF)).astype(np.float64)
        u52, bias = np.uint64(52), np.uint64(1023)
        e_hi = (np.maximum(hi, 1.0).view(np.uint64) >> u52) - bias
        e_lo = (np.maximum(lo, 1.0).view(np.uint64) >> u52) - bias
        fl2 = np.where(hi > 0, e_hi.astype(np.int64) + 32, e_lo.astype(np.int64))
        lz = (64 - p) - 1 - fl2
        rank = np.where(w == 0, 64 - p + 1, lz + 1).astype(np.uint8)
        np.maximum.at(state, idx, rank)

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.maximum(a, b)

    def _idx_dtype(self):
        return np.uint16 if self.p <= 16 else np.uint32

    def to_bytes(self, state: np.ndarray) -> bytes:
        nz = np.flatnonzero(state)
        idx_dt = self._idx_dtype()
        sparse_len = _HDR.size + _SP_N.size + nz.size * (np.dtype(idx_dt).itemsize + 1)
        if sparse_len < _HDR.size + self.m:
            return (
                _HDR.pack(_MAGIC_SPARSE, self.p)
                + _SP_N.pack(nz.size)
                + nz.astype(idx_dt).tobytes()
                + state[nz].tobytes()
            )
        return _HDR.pack(_MAGIC, self.p) + state.tobytes()

    def from_bytes(self, data: bytes) -> np.ndarray:
        magic, p = _HDR.unpack_from(data, 0)
        if magic not in (_MAGIC, _MAGIC_SPARSE) or p != self.p:
            raise ValueError("HLL state mismatch")
        if magic == _MAGIC:
            return np.frombuffer(data, dtype=np.uint8, offset=_HDR.size).copy()
        (nnz,) = _SP_N.unpack_from(data, _HDR.size)
        idx_dt = self._idx_dtype()
        off = _HDR.size + _SP_N.size
        idx = np.frombuffer(data, dtype=idx_dt, count=nnz, offset=off)
        ranks = np.frombuffer(
            data, dtype=np.uint8, count=nnz, offset=off + nnz * np.dtype(idx_dt).itemsize
        )
        state = np.zeros(self.m, dtype=np.uint8)
        state[idx] = ranks
        return state

    def estimate(self, state: np.ndarray) -> float:
        m = self.m
        est = _alpha(m) * m * m / np.power(2.0, -state.astype(np.float64)).sum()
        if est <= 2.5 * m:
            zeros = int((state == 0).sum())
            if zeros:
                return m * math.log(m / zeros)  # linear counting
        return float(est)

    # -- convenience -----------------------------------------------------------
    def count_distinct(self, df, col: str) -> float:
        return self.estimate(self.build(df, col))
