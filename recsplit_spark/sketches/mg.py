"""Misra-Gries heavy-hitters sketch (mergeable, Agarwal et al. 2012).

State: at most k (item -> counter) pairs plus two exact scalars — n, the
total number of items folded in, and dec, the cumulative decrement applied
by capacity trims. Trim rule: when more than k counters exist, subtract
the (k+1)-th largest counter value from every counter and drop the
non-positive ones (at most k survive, since only counters strictly above
the pivot stay positive).

Guarantees (the published "mergeable summaries" bound, carried per-state):

  0 <= true(x) - est(x) <= dec <= n / (k + 1)        for every item x
  any x with true(x) > dec is retained (est(x) >= true(x) - dec > 0)

The *retained set* depends on merge order (only the bound is
order-independent), so driver queries report bound-booleans on exactly-
counted items — deterministic under any partitioning — rather than raw
estimates. Merge = counter-wise sum followed by the same trim; the summed
dec fields keep the certificate exact through arbitrary merge trees.

Reference analogue: the frequency side of minperf's key-universe tooling
(count-min in this repo covers point queries; MG answers "which tokens are
frequent" without a 10^12-row groupBy — the shuffle carries k-entry
states only).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import MergeableSketch

_HDR = struct.Struct("<4sIIqq")  # magic, k, n_entries, n_total, dec
_MAGIC = b"MGS1"


class MGState:
    __slots__ = ("counts", "n", "dec")

    def __init__(self, counts=None, n: int = 0, dec: int = 0) -> None:
        self.counts: dict[str, int] = counts if counts is not None else {}
        self.n = n
        self.dec = dec


class MisraGries(MergeableSketch):
    input_kind = "string"
    #: n-gram feeds are meaningful for MG even though it is item-identity:
    #: the items become the int64 gram hashes themselves (decimal-string
    #: keys), and exact per-hash counting IS heavy-hitting over grams —
    #: multi.heavy_ngrams resolves the top hashes back to token grams.
    accepts_ngram_hashes = True

    def __init__(self, k: int = 128) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k

    def approx_state_bytes(self) -> None:
        # Unknown: items are unbounded strings (URLs, long tokens), so no
        # fixed per-entry constant upper-bounds a serialized state — a hint
        # that undershoots would let build() skip the distributed pre-merge
        # while the real collect blows the 64 MB budget. None makes the
        # pre-merge decision conservative (pre-merge whenever P > 4).
        return None

    def approx_state_bytes_for(self, ngram: int | None):
        # The ngram feed's items are int64 window hashes, serialized as
        # canonical decimal strings: <= 20 bytes + 12 framing per entry.
        # A real bound here lets build() skip the distributed pre-merge
        # stage for heavy_ngrams-sized states (round 6: the spurious
        # pre-merge was ~25% of the heavy_ngrams wall at 20k docs).
        if ngram is not None:
            return _HDR.size + self.k * 32
        return self.approx_state_bytes()

    # -- monoid ----------------------------------------------------------------
    def new_state(self) -> MGState:
        return MGState()

    def _trim(self, state: MGState) -> None:
        if len(state.counts) <= self.k:
            return
        vals = np.fromiter(state.counts.values(), dtype=np.int64)
        # pivot = (k+1)-th largest counter; subtracting it zeroes-or-kills
        # everything at-or-below and leaves <= k survivors
        pivot = int(np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1])
        state.counts = {
            item: c - pivot for item, c in state.counts.items() if c > pivot
        }
        state.dec += pivot

    def update(self, state: MGState, arr: np.ndarray) -> None:
        """Fold a batch of items. NULLs are NOT items: they are dropped
        before counting and excluded from ``state.n`` (so the certificate
        ``n/(k+1)`` bounds undercounts over actual items). Lineage row
        counts (e.g. CheckpointedBuild metrics ``n_rows``) count raw rows
        including nulls and may legitimately exceed ``state.n`` on
        nullable columns."""
        if len(arr) == 0:
            return
        a = np.asarray(arr)
        # uint64 stays on the generic path: casting to int64 would wrap
        # values > 2^63 while str(item) keys them unsigned
        int_ok = a.dtype.kind == "i" or (
            a.dtype.kind == "u" and a.dtype.itemsize < 8
        )
        if int_ok and self._update_int(state, a):
            return
        vc = pd.Series(arr).dropna().value_counts()
        state.n += int(vc.sum())
        counts = state.counts
        for item, c in vc.items():
            key = str(item)
            counts[key] = counts.get(key, 0) + int(c)
        self._trim(state)

    def _update_int(self, state: MGState, a: np.ndarray) -> bool:
        """Vectorized fold for integer item batches (the n-gram hash feed:
        millions of int64 window hashes per partition). Value-identical to
        the generic path — same combined multiset, same single trim with
        the (k+1)-th-largest pivot — but the per-item work is numpy
        sort/reduceat instead of a Python dict loop, and only the <= k
        survivors ever become dict entries. Returns False (caller falls
        back) when existing state keys aren't CANONICAL int64 decimals (a
        state previously fed string items): '007', '+3', ' 3' or out-of-
        int64-range keys parse via int() but the final dict rebuild would
        rewrite them to canonical form, silently merging keys the generic
        path keeps distinct."""
        counts = state.counts
        if counts:
            try:
                ek = np.fromiter(
                    (int(s) for s in counts), dtype=np.int64, count=len(counts)
                )
            except (ValueError, OverflowError):
                return False
            if any(str(int(v)) != s for s, v in zip(counts, ek)):
                return False
            ev = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        else:
            ek = ev = None
        u, c = np.unique(a.astype(np.int64, copy=False), return_counts=True)
        c = c.astype(np.int64, copy=False)
        state.n += int(len(a))
        if ek is not None:
            u = np.concatenate([u, ek])
            c = np.concatenate([c, ev])
            order = np.argsort(u, kind="stable")
            u, c = u[order], c[order]
            starts = np.flatnonzero(
                np.concatenate([[True], u[1:] != u[:-1]])
            )
            u = u[starts]
            c = np.add.reduceat(c, starts)
        if len(u) > self.k:
            pivot = int(
                np.partition(c, len(c) - self.k - 1)[len(c) - self.k - 1]
            )
            keep = c > pivot
            u, c = u[keep], c[keep] - pivot
            state.dec += pivot
        state.counts = {str(int(x)): int(v) for x, v in zip(u, c)}
        return True

    def merge(self, a: MGState, b: MGState) -> MGState:
        if len(a.counts) < len(b.counts):
            a, b = b, a
        out = MGState(dict(a.counts), a.n + b.n, a.dec + b.dec)
        counts = out.counts
        for item, c in b.counts.items():
            counts[item] = counts.get(item, 0) + c
        self._trim(out)
        return out

    def to_bytes(self, state: MGState) -> bytes:
        parts = [_HDR.pack(_MAGIC, self.k, len(state.counts), state.n, state.dec)]
        for item, c in state.counts.items():
            raw = item.encode("utf-8")
            parts.append(struct.pack("<Iq", len(raw), c))
            parts.append(raw)
        return b"".join(parts)

    def from_bytes(self, data: bytes) -> MGState:
        magic, k, n_entries, n_total, dec = _HDR.unpack_from(data, 0)
        if magic != _MAGIC or k != self.k:
            raise ValueError("MG state mismatch")
        off = _HDR.size
        counts: dict[str, int] = {}
        for _ in range(n_entries):
            ln, c = struct.unpack_from("<Iq", data, off)
            off += 12
            counts[data[off : off + ln].decode("utf-8")] = c
            off += ln
        return MGState(counts, n_total, dec)

    # -- queries -----------------------------------------------------------------
    def error_bound(self, state: MGState) -> int:
        """Certified max undercount for any item (<= n/(k+1))."""
        return state.dec

    def estimate_count(self, state: MGState, item: str) -> int:
        return state.counts.get(item, 0)

    def top_items(self, state: MGState, n: int = 10) -> list[tuple[str, int]]:
        return sorted(state.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
