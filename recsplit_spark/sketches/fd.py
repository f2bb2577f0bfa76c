"""Frequent Directions — a mergeable matrix sketch over embedding columns
(Liberty 2013; Ghashami, Liberty, Phillips & Woodruff 2016).

The sketch maintains B (<= ``ell`` rows after compaction) such that

    0  ⪯  AᵀA − BᵀB  ⪯  Δ·I          (Δ carried exactly in the state)

where A stacks every vector fed so far, and the total shrink mass Δ obeys
the published bound Δ <= ||A||_F² / ell (each shrink of a (>ell)-row
buffer removes at least ell·δ of squared Frobenius mass). ||A||_F² is
folded exactly (it is linear), so every state carries BOTH its runtime
certificate Δ and the a-priori bound — callers can verify, not trust.

Merge = stack rows + add (Δ, fro2) + shrink: the standard FD mergeability
argument shows the certificate survives arbitrary merge trees, which is
what lets the per-partition `mapInPandas` fold + state-only shuffle of
`MergeableSketch` work unchanged at any scale. Unlike the hash sketches
FD is NOT byte-order-independent — different partitionings give different
(all certificate-satisfying) B matrices — so tests pin the invariants
(PSD sandwich + bounds), never bytes.

Uses: covariance/Gram estimation of a 10^12-row embedding table with a
driver-side d×d result, top singular directions (sketched PCA), leverage
proxies — the matrix analogue of the scalar sketches in this package.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import MergeableSketch

_HDR = struct.Struct("<4sIIddI")
_MAGIC = b"FDS1"


def _as_matrix(arr, d: int) -> np.ndarray:
    """Batch input (object array / list of array<double> rows, or an
    already-2D float array) -> (n, d) float64 matrix."""
    if isinstance(arr, np.ndarray) and arr.ndim == 2 and arr.dtype != object:
        m = np.ascontiguousarray(arr, dtype=np.float64)
    else:
        m = np.array([np.asarray(v, dtype=np.float64) for v in arr],
                     dtype=np.float64)
        if m.ndim == 1:  # zero rows
            m = m.reshape(0, d)
    if m.shape[1] != d:
        raise ValueError(
            f"FrequentDirections(d={d}) fed vectors of dim {m.shape[1]}"
        )
    return m


def exact_gram(df, col: str) -> np.ndarray:
    """EXACT AᵀA (d x d) of an embedding column via per-partition partial
    sums — the driver receives P d×d partials (flattened arrays), never
    vector rows, so this scales to any row count (it is the verification
    companion to the sketch: at small d the exact Gram is itself cheap)."""
    import pandas as pd

    first = df.select(col).first()
    if first is None:
        raise ValueError("exact_gram on an empty DataFrame")
    d = len(first[col])

    def _partial(batches):
        g = np.zeros((d, d))
        for pdf in batches:
            m = np.array(pdf[col].tolist(), dtype=np.float64)
            if len(m):
                g += m.T @ m
        yield pd.DataFrame({"g": [g.ravel().tolist()]})

    rows = df.select(col).mapInPandas(
        _partial, schema="g array<double>"
    ).collect()
    G = np.zeros((d, d))
    for r in rows:
        G += np.asarray(r["g"], dtype=np.float64).reshape(d, d)
    return G


class FrequentDirections(MergeableSketch):
    input_kind = "vector"
    elementwise_update = False  # shrink points depend on batch boundaries

    def __init__(self, d: int, ell: int = 64) -> None:
        if ell < 2:
            raise ValueError("ell must be >= 2")
        self.d = int(d)
        self.ell = int(ell)

    def approx_state_bytes(self) -> int:
        return _HDR.size + 8 * self.ell * self.d

    # -- monoid ---------------------------------------------------------------
    def new_state(self) -> dict:
        return {
            "rows": np.zeros((0, self.d), dtype=np.float64),
            "delta": 0.0,
            "fro2": 0.0,
        }

    def _shrink(self, rows: np.ndarray) -> tuple[np.ndarray, float]:
        """Compact to <= ell rows; returns (rows, removed-mass delta).
        Zeroed rows are trimmed so light states serialize small."""
        if rows.shape[0] <= self.ell:
            return rows, 0.0
        _, s, vt = np.linalg.svd(rows, full_matrices=False)
        s2 = s * s
        dlt = float(s2[self.ell]) if len(s2) > self.ell else 0.0
        kept = np.sqrt(np.maximum(s2[: self.ell] - dlt, 0.0))
        nz = np.flatnonzero(kept > 0)
        return kept[nz, None] * vt[nz], dlt

    def update(self, state: dict, arr) -> None:
        m = _as_matrix(arr, self.d)
        if m.shape[0] == 0:
            return
        state["fro2"] += float(np.einsum("ij,ij->", m, m))
        rows = state["rows"]
        # fold in ell-row slabs so every SVD sees <= 2*ell rows
        for lo in range(0, m.shape[0], self.ell):
            rows = np.vstack([rows, m[lo : lo + self.ell]])
            if rows.shape[0] > 2 * self.ell:
                rows, dlt = self._shrink(rows)
                state["delta"] += dlt
        state["rows"] = rows

    def merge(self, a: dict, b: dict) -> dict:
        rows = np.vstack([a["rows"], b["rows"]])
        delta = a["delta"] + b["delta"]
        if rows.shape[0] > 2 * self.ell:
            rows, dlt = self._shrink(rows)
            delta += dlt
        return {"rows": rows, "delta": delta, "fro2": a["fro2"] + b["fro2"]}

    def to_bytes(self, state: dict) -> bytes:
        rows, dlt = self._shrink(state["rows"])  # compact to <= ell rows
        delta = state["delta"] + dlt
        hdr = _HDR.pack(_MAGIC, self.ell, self.d, delta, state["fro2"],
                        rows.shape[0])
        return hdr + np.ascontiguousarray(rows).tobytes()

    def from_bytes(self, data: bytes) -> dict:
        magic, ell, d, delta, fro2, n = _HDR.unpack_from(data, 0)
        if magic != _MAGIC or (ell, d) != (self.ell, self.d):
            raise ValueError("FrequentDirections state mismatch")
        rows = (
            np.frombuffer(data, dtype=np.float64, offset=_HDR.size,
                          count=n * d)
            .reshape(n, d)
            .copy()
        )
        return {"rows": rows, "delta": float(delta), "fro2": float(fro2)}

    # -- queries ----------------------------------------------------------------
    def cov_estimate(self, state: dict) -> np.ndarray:
        """BᵀB (d x d): 0 ⪯ AᵀA − BᵀB ⪯ error_certificate(state)·I."""
        r = state["rows"]
        return r.T @ r

    def error_certificate(self, state: dict) -> float:
        """The exact total shrink mass Δ this state accumulated — a
        runtime spectral-error certificate, always <= published_bound."""
        return float(state["delta"])

    def published_bound(self, state: dict) -> float:
        """The a-priori FD guarantee ||A||_F² / ell (GLPW 2016 Thm 1.1
        at k=0), computable without knowing the stream."""
        return state["fro2"] / self.ell

    def top_directions(self, state: dict, k: int):
        """(singular_values, directions): the top-k right singular pairs
        of the sketch — sketched PCA axes of the full stream. Singular
        VALUES of A are matched within sqrt(Δ) per component (the PSD
        sandwich); directions approximate A's top row space."""
        _, s, vt = np.linalg.svd(state["rows"], full_matrices=False)
        k = min(k, len(s))
        return s[:k], vt[:k]
