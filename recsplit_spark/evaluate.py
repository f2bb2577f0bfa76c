"""Vectorized MPHF evaluation (the fast path behind MPHFDescriptor).

Two-stage design mirroring the build wavefront (reference evaluator:
``RecSplitEvaluator.evaluate`` + ``skip``, ``RecSplitEvaluator.java:68-176``):

1. **Vectorized whole-descriptor decode at construction.** A bucket's
   Rice-code layout (node sizes and Rice parameters in DFS order) is a pure
   function of its key count, and bucket streams are byte-aligned slices —
   so all buckets of equal size decode in lockstep: one ``searchsorted``
   into the global zero-bit index reads the j-th unary run of EVERY such
   bucket at once, one gather reads all the remainders. Python dispatch is
   O(distinct sizes x nodes-per-tree), independent of bucket count. The
   decoded trial indices live in one flat int64 array indexed by
   (bucket node offset + DFS position), built once per executor process.

2. **Level-synchronous walk.** All keys of a batch descend together: keys
   are grouped by current node *size* (same size => same split shape, same
   child tables), each group advances with a handful of numpy ops —
   supplemental positions, searchsorted over part bounds, table lookups for
   the child's DFS offset / key-range offset / size. Python dispatch is
   O(depth x distinct sizes), not O(keys x nodes).
"""

from __future__ import annotations

import numpy as np

from .hashing import GOLDEN, positions_inplace
from .settings import Settings


# ---------------------------------------------------------------------------
# per-size walk tables (pure function of Settings => cached per leaf_size)
# ---------------------------------------------------------------------------

class _WalkTables:
    """For each set size: part bounds + child lookup arrays."""

    def __init__(self, settings: Settings) -> None:
        self.settings = settings
        self._by_size: dict[int, tuple] = {}
        self._dfs_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def get(self, s: int):
        t = self._by_size.get(s)
        if t is None:
            st = self.settings
            st.ensure(s)
            parts = st.parts[s]
            parts_arr = np.array(parts, dtype=np.int64)
            bounds = np.cumsum(parts_arr)
            child_size = parts_arr
            child_add_off = bounds - parts_arr  # key-range start per child
            sub = np.array([st.subtree_nodes[a] for a in parts], dtype=np.int64)
            child_dfs_off = 1 + np.concatenate([[0], np.cumsum(sub[:-1])])
            # child-index shortcut for the two shapes the DP emits almost
            # exclusively: equal m-way splits (child = pos // t, exact
            # floor-divide replaces the binary search) and asymmetric
            # 2-way splits (child = pos >= a). Both are provably equal to
            # searchsorted(bounds, pos, 'right') for pos in [0, s).
            if len(parts) > 1 and all(p == parts[0] for p in parts):
                kind, arg = 1, np.int64(parts[0])
            elif len(parts) == 2:
                kind, arg = 2, np.int64(parts[0])
            else:
                kind, arg = 0, np.int64(0)
            t = (bounds, child_size, child_add_off, child_dfs_off, kind, arg)
            self._by_size[s] = t
        return t

    def dfs_rice_ks(self, s: int) -> np.ndarray:
        """Rice parameters of the size-s tree's nodes in DFS order."""
        c = self._dfs_cache.get(s)
        if c is None:
            st = self.settings
            st.ensure(s)
            ks: list[int] = []
            stack = [s]
            while stack:
                x = stack.pop()
                ks.append(st.rice_k[x])
                stack.extend(reversed(st.parts[x]))
            c = np.array(ks, dtype=np.int64)
            self._dfs_cache[s] = c
        return c


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

class VectorEvaluator:
    """Worker-side evaluator over a parsed descriptor (see MPHFDescriptor)."""

    def __init__(
        self,
        settings: Settings,
        bucket_log2: int,
        offsets: np.ndarray,
        byte_starts: np.ndarray,
        stream: bytes,
    ) -> None:
        self.settings = settings
        self.bucket_log2 = bucket_log2
        self.offsets = offsets
        self.tables = _WalkTables(settings)
        bc = len(offsets) - 1
        sizes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        self.bucket_sizes = sizes
        settings.ensure(int(sizes.max()) if bc else 1)
        sub = np.array(settings.subtree_nodes, dtype=np.int64)
        nodes_per_bucket = sub[sizes]
        self.node_off = np.zeros(bc + 1, dtype=np.int64)
        np.cumsum(nodes_per_bucket, out=self.node_off[1:])
        self.codes = np.empty(int(self.node_off[-1]), dtype=np.int64)
        self._decode_all(byte_starts, stream)
        # shrink the trial-index table to the smallest dtype that fits: it is
        # the dominant broadcast payload (≈13.4 b/key at int64) and the
        # walk's hottest gather target — uint16 typically fits (leaf-8 trial
        # indices run ~10^2-10^4) and cuts both 4x. Gathers upcast back to
        # int64 automatically in the walk arithmetic.
        cmax = int(self.codes.max()) if len(self.codes) else 0
        for dt in (np.uint16, np.uint32):
            if cmax < np.iinfo(dt).max:
                self.codes = self.codes.astype(dt)
                break
        # the walk's per-level group sort radixes 5x faster over 2-byte
        # keys; node sizes only shrink down the tree, so one check of the
        # largest bucket decides the cast for every level
        self._sort_u16 = int(sizes.max()) < 65536 if bc else True

    @staticmethod
    def _windows(words: np.ndarray, cursors: np.ndarray) -> np.ndarray:
        """64-bit MSB-aligned windows starting at bit positions ``cursors``."""
        wi = (cursors >> np.uint64(6)).astype(np.int64)
        sh = cursors & np.uint64(63)
        hi = words[wi] << sh
        # sh==0 would right-shift by 64 (UB): shift by (64-sh)&63 then mask
        lo = words[wi + 1] >> ((np.uint64(64) - sh) & np.uint64(63))
        return hi | np.where(sh == 0, np.uint64(0), lo)

    def _decode_all(self, byte_starts: np.ndarray, stream: bytes) -> None:
        """Lockstep decode of every bucket (see module docstring).

        Unary runs + remainders are read from 64-bit windows gathered out of
        the PACKED big-endian word array (stream/8 bytes — L2-resident per
        worker), with leading-ones counted by converting the inverted window
        to float64 (exact: quotients are capped at 47 bits by the builder,
        so the examined value fits 48 < 53 mantissa bits) and extracting the
        IEEE-754 exponent field directly — NOT via np.log2, whose libm
        implementation is only guaranteed 1-2 ulp on some platforms and
        could round 2^48-1 up to exponent 48, wrapping q. Earlier versions
        walked an expanded next-zero table / zero-position index — DRAM-
        latency-bound gathers that degraded ~8x under 32-way executor
        concurrency; window reads into a ~2 MB array do not."""
        if len(stream) == 0:
            return
        pad = (-len(stream)) % 8 + 16
        words = np.frombuffer(stream + b"\x00" * pad, dtype=">u8").astype(np.uint64)
        codes = self.codes
        U16, U47, U64 = np.uint64(16), np.uint64(47), np.uint64(64)
        U52, U1023 = np.uint64(52), np.uint64(1023)
        for s in np.unique(self.bucket_sizes):
            s = int(s)
            if s == 0:
                continue
            bsel = np.flatnonzero(self.bucket_sizes == s)
            cursors = (byte_starts[bsel] * 8).astype(np.uint64)
            node_base = self.node_off[bsel]
            ks = self.tables.dfs_rice_ks(s)
            for j, k in enumerate(ks.tolist()):
                x = self._windows(words, cursors)
                y = ((~x) >> U16) | np.uint64(1)  # top 48 bits, exponent(0) guard
                # floor(log2(y)) via the float64 exponent bits: the cast is
                # exact for y < 2^53, so the biased exponent IS floor(log2)
                e = (y.astype(np.float64).view(np.uint64) >> U52) - U1023
                q = U47 - e
                cursors = cursors + q + np.uint64(1)
                if k:
                    uk = np.uint64(k)
                    rem = self._windows(words, cursors) >> (U64 - uk)
                    cursors = cursors + uk
                    codes[node_base + j] = ((q << uk) | rem).astype(np.int64)
                else:
                    codes[node_base + j] = q.astype(np.int64)

    def evaluate(self, sigs: np.ndarray) -> np.ndarray:
        sigs = np.ascontiguousarray(sigs, dtype=np.int64)
        n = len(sigs)
        out = np.empty(n, dtype=np.int64)
        if n == 0:
            return out
        if self.bucket_log2 == 0:
            buckets = np.zeros(n, dtype=np.int64)
        else:
            buckets = (sigs >> (64 - self.bucket_log2)) & np.int64(
                (1 << self.bucket_log2) - 1
            )

        # walk state per key
        size = self.bucket_sizes[buckets]
        dfs = self.node_off[buckets]  # absolute node index
        add = self.offsets[buckets].astype(np.int64)
        # empty buckets: non-member keys, unspecified result
        done_empty = size == 0
        out[done_empty] = add[done_empty]
        active = np.flatnonzero(~done_empty)
        st = self.settings
        leaf = st.leaf_size
        codes = self.codes
        sort_u16 = getattr(self, "_sort_u16", False)
        while len(active):
            asize = size[active]
            # group by node size; same size => same tables. uint16 sort
            # keys: numpy's radix pass count follows the dtype width —
            # measured 5x on 131k-row batches (sizes always fit: checked
            # against the largest bucket at decode)
            order = np.argsort(
                asize.astype(np.uint16) if sort_u16 else asize, kind="stable"
            )
            asorted = active[order]
            ssorted = asize[order]
            group_bounds = np.flatnonzero(np.diff(ssorted)) + 1
            starts = np.concatenate([[0], group_bounds])
            ends = np.concatenate([group_bounds, [len(ssorted)]])
            still = []
            for gs, ge in zip(starts, ends):
                rows = asorted[gs:ge]
                s = int(ssorted[gs])
                idx = codes[dfs[rows]]
                x = sigs[rows] + idx * GOLDEN
                pos = positions_inplace(x, s)
                if s <= leaf:
                    out[rows] = add[rows] + pos
                    continue
                bounds, child_size, child_add_off, child_dfs_off, kind, arg = (
                    self.tables.get(s)
                )
                if kind == 1:  # equal m-way split
                    child = pos // arg
                elif kind == 2:  # asymmetric 2-way split
                    child = (pos >= arg).astype(np.int64)
                else:
                    child = np.searchsorted(bounds, pos, side="right")
                add[rows] += child_add_off[child]
                dfs[rows] += child_dfs_off[child]
                size[rows] = child_size[child]
                still.append(rows)
            active = np.concatenate(still) if still else np.empty(0, np.int64)
        return out
