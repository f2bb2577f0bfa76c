"""t-digest quantile sketch (Dunning & Ertl), merging variant with the k1
(arcsine) scale function — tail-accurate quantiles over numeric columns.

State: sorted centroids (mean, weight) + min/max + total. Compression
assigns each point/centroid to the cluster floor(k1(q_mid)) — the uniform
k-partition variant, which is fully vectorizable (one sort + reduceat per
batch, no per-centroid Python loop) and guarantees every cluster spans at
most one unit of k, i.e. the standard t-digest size bound (~delta
centroids). Merge = concatenate + recompress. Rank error near the median is
O(1/delta), shrinking toward the tails (asin derivative) — asserted
empirically by tests.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .base import MergeableSketch

_HDR = struct.Struct("<4sIQddI")
_MAGIC = b"TDG1"


@dataclass
class TDigestState:
    means: np.ndarray
    weights: np.ndarray
    count: int = 0
    vmin: float = float("inf")
    vmax: float = float("-inf")


class TDigest(MergeableSketch):
    input_kind = "value"

    def __init__(self, compression: float = 200.0) -> None:
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)

    def approx_state_bytes(self) -> int:
        # <= ~2*compression centroids x (mean, weight) float64
        return _HDR.size + int(32 * self.compression)

    # k1 scale: k(q) = (delta / 2pi) * asin(2q - 1)
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        if len(means) == 0:
            return means, weights
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        qmid = (np.cumsum(w) - w / 2.0) / total
        cluster = np.floor(self._k(qmid)).astype(np.int64)
        # group consecutive equal cluster ids
        boundaries = np.flatnonzero(np.diff(cluster)) + 1
        starts = np.concatenate([[0], boundaries])
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        return msum / wsum, wsum

    # -- monoid ---------------------------------------------------------------
    def new_state(self) -> TDigestState:
        return TDigestState(np.empty(0, np.float64), np.empty(0, np.float64))

    def update(self, state: TDigestState, arr: np.ndarray) -> None:
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if len(arr) == 0:
            return
        state.count += len(arr)
        state.vmin = min(state.vmin, float(arr.min()))
        state.vmax = max(state.vmax, float(arr.max()))
        means = np.concatenate([state.means, arr])
        weights = np.concatenate([state.weights, np.ones(len(arr))])
        state.means, state.weights = self._compress(means, weights)

    def merge(self, a: TDigestState, b: TDigestState) -> TDigestState:
        means, weights = self._compress(
            np.concatenate([a.means, b.means]),
            np.concatenate([a.weights, b.weights]),
        )
        return TDigestState(
            means,
            weights,
            a.count + b.count,
            min(a.vmin, b.vmin),
            max(a.vmax, b.vmax),
        )

    # -- serialization -----------------------------------------------------------
    def to_bytes(self, state: TDigestState) -> bytes:
        head = _HDR.pack(
            _MAGIC,
            int(self.compression),
            state.count,
            state.vmin,
            state.vmax,
            len(state.means),
        )
        return head + state.means.tobytes() + state.weights.tobytes()

    def from_bytes(self, data: bytes) -> TDigestState:
        magic, comp, count, vmin, vmax, nc = _HDR.unpack_from(data, 0)
        if magic != _MAGIC or comp != int(self.compression):
            raise ValueError("TDigest state mismatch")
        off = _HDR.size
        means = np.frombuffer(data, np.float64, count=nc, offset=off).copy()
        weights = np.frombuffer(data, np.float64, count=nc, offset=off + 8 * nc).copy()
        return TDigestState(means, weights, count, vmin, vmax)

    # -- queries ----------------------------------------------------------------
    def quantile(self, state: TDigestState, q) -> np.ndarray | float:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(state.means) == 0:
            out = np.full(len(qs), np.nan)
        else:
            w = state.weights
            cum = (np.cumsum(w) - w / 2.0) / w.sum()
            out = np.interp(qs, cum, state.means, left=state.vmin, right=state.vmax)
        return out if np.ndim(q) else float(out[0])

    def cdf(self, state: TDigestState, x: float) -> float:
        if len(state.means) == 0:
            return float("nan")
        w = state.weights
        cum = (np.cumsum(w) - w / 2.0) / w.sum()
        return float(np.interp(x, state.means, cum, left=0.0, right=1.0))

    def estimate(self, state: TDigestState) -> float:
        """Scalar summary = median (for the generic aggregate API)."""
        return self.quantile(state, 0.5)
