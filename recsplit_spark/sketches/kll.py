"""KLL quantile sketch (Karnin, Lang, Liberty 2016) — simplified dense form.

State: a stack of compactors; items at level i carry weight 2^i. Level
capacities shrink geometrically (c = 2/3) below the top. Compaction sorts a
level and promotes every other item (deterministic content-derived coin, so
identical inputs give identical sketches). Merge = levelwise concatenation +
re-compaction. Normalized rank error is O(1/k) w.h.p.; tests assert the
conventional epsilon ~ 2.296/k bound with margin against exact ranks and
against Spark's ``percentile_approx``.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from .base import MergeableSketch

_HDR = struct.Struct("<4sIQddI")
_MAGIC = b"KLL1"
_C = 2.0 / 3.0


@dataclass
class KLLState:
    levels: list[np.ndarray] = field(default_factory=list)
    count: int = 0
    vmin: float = float("inf")
    vmax: float = float("-inf")


class KLL(MergeableSketch):
    input_kind = "value"

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k

    @property
    def epsilon(self) -> float:
        """Conventional normalized rank error bound ~ 2.296 / k."""
        return 2.296 / self.k

    def approx_state_bytes(self) -> int:
        # ~k items at the top level + geometrically-capped lower levels,
        # x8 bytes, with headroom for the per-level headers
        return _HDR.size + 8 * self.k * 12

    def _cap(self, level: int, num_levels: int) -> int:
        depth = num_levels - 1 - level
        return max(2, int(np.ceil(self.k * (_C**depth))))

    # -- monoid ---------------------------------------------------------------
    def new_state(self) -> KLLState:
        return KLLState(levels=[np.empty(0, dtype=np.float64)])

    def update(self, state: KLLState, arr: np.ndarray) -> None:
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if len(arr) == 0:
            return
        state.count += len(arr)
        state.vmin = min(state.vmin, float(arr.min()))
        state.vmax = max(state.vmax, float(arr.max()))
        state.levels[0] = np.concatenate([state.levels[0], arr])
        self._compress(state)

    def merge(self, a: KLLState, b: KLLState) -> KLLState:
        out = KLLState(
            levels=[],
            count=a.count + b.count,
            vmin=min(a.vmin, b.vmin),
            vmax=max(a.vmax, b.vmax),
        )
        n = max(len(a.levels), len(b.levels))
        for i in range(n):
            xs = []
            if i < len(a.levels):
                xs.append(a.levels[i])
            if i < len(b.levels):
                xs.append(b.levels[i])
            out.levels.append(np.concatenate(xs) if xs else np.empty(0, np.float64))
        self._compress(out)
        return out

    def _compress(self, state: KLLState) -> None:
        i = 0
        while i < len(state.levels):
            lv = state.levels[i]
            cap = self._cap(i, len(state.levels))
            if len(lv) <= cap:
                i += 1
                continue
            srt = np.sort(lv)
            # deterministic coin from content: same data -> same sketch
            coin = zlib.crc32(srt.tobytes()) & 1
            promoted = srt[coin::2]
            state.levels[i] = np.empty(0, dtype=np.float64)
            if i + 1 == len(state.levels):
                state.levels.append(promoted)
            else:
                state.levels[i + 1] = np.concatenate(
                    [state.levels[i + 1], promoted]
                )
            i += 1

    # -- serialization -----------------------------------------------------------
    def to_bytes(self, state: KLLState) -> bytes:
        head = _HDR.pack(
            _MAGIC, self.k, state.count, state.vmin, state.vmax, len(state.levels)
        )
        lens = struct.pack(f"<{len(state.levels)}I", *(len(l) for l in state.levels))
        return head + lens + b"".join(l.tobytes() for l in state.levels)

    def from_bytes(self, data: bytes) -> KLLState:
        magic, k, count, vmin, vmax, nlev = _HDR.unpack_from(data, 0)
        if magic != _MAGIC or k != self.k:
            raise ValueError("KLL state mismatch")
        off = _HDR.size
        lens = struct.unpack_from(f"<{nlev}I", data, off)
        off += 4 * nlev
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(data, np.float64, count=ln, offset=off).copy())
            off += 8 * ln
        return KLLState(levels, count, vmin, vmax)

    # -- queries ----------------------------------------------------------------
    def _items_weights(self, state: KLLState):
        vals, wts = [], []
        for i, lv in enumerate(state.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 2**i, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, state: KLLState, x: float) -> float:
        """Estimated normalized rank of x (fraction of items <= x)."""
        v, w = self._items_weights(state)
        if len(v) == 0:
            return 0.0
        return float(w[v <= x].sum() / w.sum())

    def quantile(self, state: KLLState, q) -> np.ndarray | float:
        """Estimated quantile(s) for q in [0, 1]."""
        v, w = self._items_weights(state)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(v) == 0:
            out = np.full(len(qs), np.nan)
        else:
            cum = np.cumsum(w) - w / 2.0
            cum /= w.sum()
            out = np.interp(qs, cum, v, left=state.vmin, right=state.vmax)
        return out if np.ndim(q) else float(out[0])

    def estimate(self, state: KLLState) -> float:
        """Scalar summary = median (for the generic aggregate API)."""
        return self.quantile(state, 0.5)
