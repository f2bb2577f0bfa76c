"""Weighted distinct sample — mergeable bottom-k by exponential ranks.

The "w-mins" / bottom-k weighted sketch (Cohen & Kaplan 2007,
"Summarizing data using bottom-k sketches"; equivalent to
Efraimidis-Spirakis A-ES reservoir sampling by the monotone transform
u^(1/w) <-> -ln(u)/w): every distinct value gets a deterministic rank

    rank = -ln(u) / w,   u = (xxhash64(value) + 0.5) / 2^64  in (0, 1)

which is an Exp(w) draw, and the state keeps the k SMALLEST ranks. The
retained values are a weighted-without-replacement sample of the
distinct-value universe (heavier values exponentially more likely to
hold small ranks), and because "k smallest of a set union" is order-
independent, the state is a deterministic function of the (value,
weight) set — merges are commutative + associative (north-rule
order-independence), and samples taken per ingest batch merge into
exactly the sample of the union.

Weight semantics: the weight of a distinct value is the MAX weight seen
across its rows (max is the only per-value fold that stays exact under
bottom-k merges — a retained row always carries its value's smallest
rank, i.e. its largest weight). For typical use the value column is a
document key that appears once per row, so max == the row's weight.
Rows with NULL, NaN, or non-positive weight are skipped.

Total-weight estimator (the bottom-k conditioning estimator with
exponential ranks): with fewer than k distinct values the state retains
ALL of them and sum(weights) is exact; when full,

    W^ = (k - 1) / rank_(k)

(rank_(k) = the k-th smallest rank) — unbiased with relative std err
~ 1/sqrt(k - 2), the same shape as the KMV distinct estimator (which is
this estimator at all-equal weights).

Training-data use: "sample 10k documents proportional to quality score
(or token count) for curriculum mixing / manual QA" in two scans with
zero row shuffle — scan 1 folds KB-sized states, scan 2 resolves the
retained hashes back to values with a broadcast semi-join
(``theta.resolve_hash_values`` shape). A ``seed`` salt (part of the
serialized config) yields independent replicate samples.

Reference scope note: minperf has no sampling surface; the sketch
belongs to the north-rule mergeable-sketch family (distinct ->
weighted-distinct generalization of the theta bottom-k sample).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

_HDR = struct.Struct("<4sIqI")  # magic, k, seed, n_retained
_MAGIC = b"WSS1"
_INV_RANGE = float(2.0**-64)


@dataclass
class WSampleState:
    #: parallel arrays sorted by (rank, h) ascending, len <= k
    rank: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    h: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint64))
    w: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))


class WeightedSample:
    """Mergeable weighted distinct sample (bottom-k exponential ranks).

    Standalone (not a :class:`MergeableSketch`) because its input is a
    (value, weight) column PAIR — the shared single-column plumbing
    doesn't apply — but it follows the same two-phase partials/merge
    contract, so its state tables compose with the incremental-profile
    commit discipline via :meth:`merge_state_tables`."""

    def __init__(self, k: int = 256, seed: int = 0) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = int(seed)

    @property
    def relative_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 2)

    def approx_state_bytes(self) -> int:
        return _HDR.size + 24 * self.k

    # -- monoid core (numpy, Spark-free) ----------------------------------
    def new_state(self) -> WSampleState:
        return WSampleState()

    @staticmethod
    def _ranks(h: np.ndarray, w: np.ndarray) -> np.ndarray:
        u = (h.astype(np.float64) + 0.5) * _INV_RANGE
        return -np.log(u) / w

    def _combine(self, a: WSampleState, r, h, w) -> WSampleState:
        """Fold candidate (rank, hash, weight) arrays into a copy of
        ``a``: per-hash min rank (== max weight), then the k smallest by
        (rank, hash) — deterministic under any batch/merge split."""
        rank = np.concatenate([a.rank, r])
        hh = np.concatenate([a.h, h])
        ww = np.concatenate([a.w, w])
        order = np.lexsort((hh, rank))
        rank, hh, ww = rank[order], hh[order], ww[order]
        # first occurrence per hash in rank-ascending order = min rank
        _, idx = np.unique(hh, return_index=True)
        rank, hh, ww = rank[idx], hh[idx], ww[idx]
        order = np.lexsort((hh, rank))[: self.k]
        return WSampleState(rank[order], hh[order], ww[order])

    def update(
        self, state: WSampleState, hashes: np.ndarray, weights: np.ndarray
    ) -> None:
        if len(hashes) == 0:
            return
        h = np.ascontiguousarray(hashes, dtype=np.int64).view(np.uint64)
        w = np.asarray(weights, dtype=np.float64)
        ok = np.isfinite(w) & (w > 0)
        if not ok.all():
            h, w = h[ok], w[ok]
        if len(h) == 0:
            return
        r = self._ranks(h, w)
        if len(state.rank) == self.k:
            # threshold prune: once full, a rank STRICTLY above the
            # current k-th smallest can never enter the bottom-k. Ties
            # must pass through: ranks of DISTINCT hashes can be exactly
            # equal (u = (h+0.5)*2^-64 rounds away the low ~11 hash
            # bits), and _combine breaks rank ties by hash — pruning a
            # tied candidate would make the state depend on batch order.
            # Same final state bit-for-bit, O(batch) instead of a sort.
            keep = r <= state.rank[-1]
            if not keep.any():
                return
            h, w, r = h[keep], w[keep], r[keep]
        st = self._combine(state, r, h, w)
        state.rank, state.h, state.w = st.rank, st.h, st.w

    def merge(self, a: WSampleState, b: WSampleState) -> WSampleState:
        return self._combine(a, b.rank, b.h, b.w)

    def to_bytes(self, state: WSampleState) -> bytes:
        n = len(state.rank)
        return (
            _HDR.pack(_MAGIC, self.k, self.seed, n)
            + state.rank.tobytes()
            + state.h.tobytes()
            + state.w.tobytes()
        )

    def from_bytes(self, data: bytes) -> WSampleState:
        magic, k, seed, n = _HDR.unpack_from(data, 0)
        if magic != _MAGIC or k != self.k or seed != self.seed:
            raise ValueError("weighted-sample state mismatch")
        off = _HDR.size
        rank = np.frombuffer(data, np.float64, offset=off, count=n).copy()
        off += 8 * n
        h = np.frombuffer(data, np.uint64, offset=off, count=n).copy()
        off += 8 * n
        w = np.frombuffer(data, np.float64, offset=off, count=n).copy()
        return WSampleState(rank, h, w)

    def total_weight_estimate(self, state: WSampleState) -> float:
        """Exact sum of per-value max weights below k distinct values;
        the unbiased (k-1)/rank_(k) conditioning estimator when full."""
        if len(state.rank) < self.k:
            return float(state.w.sum())
        return (self.k - 1) / float(state.rank[-1])

    # -- Spark plumbing -----------------------------------------------------
    def _prepped(self, df, col: str, weight_col: str, keys=()):
        from pyspark.sql import functions as F

        # same cross-type hash contract as every hash sketch, salted by
        # the (config-pinned) seed for independent replicate samples
        return df.select(
            F.xxhash64(
                F.lit(self.seed), F.col(col).cast("string")
            ).alias("__h"),
            F.col(weight_col).cast("double").alias("__w"),
            *keys,
        )

    def partials(self, df, col: str, weight_col: str, keys=()):
        """Stage 1: DataFrame[keys..., state binary], one row per
        (partition x key)."""
        import pandas as pd

        sk = self
        key_list = list(keys)
        src = self._prepped(df, col, weight_col, key_list)
        schema = (
            ", ".join(f"{k} string" for k in key_list)
            + (", " if key_list else "")
            + "state binary"
        )

        def _fold(batches):
            acc: dict[tuple, WSampleState] = {}
            for pdf in batches:
                if key_list:
                    for kv, grp in pdf.groupby(
                        key_list, sort=False, dropna=False
                    ):
                        kt = kv if isinstance(kv, tuple) else (kv,)
                        st = acc.get(kt)
                        if st is None:
                            st = acc[kt] = sk.new_state()
                        sk.update(
                            st,
                            grp["__h"].to_numpy(),
                            grp["__w"].to_numpy(),
                        )
                else:
                    st = acc.get(())
                    if st is None:
                        st = acc[()] = sk.new_state()
                    sk.update(
                        st, pdf["__h"].to_numpy(), pdf["__w"].to_numpy()
                    )
            if acc:
                rows = {
                    k: [str(kt[i]) for kt in acc]
                    for i, k in enumerate(key_list)
                }
                rows["state"] = [sk.to_bytes(st) for st in acc.values()]
                yield pd.DataFrame(rows)

        return src.mapInPandas(_fold, schema=schema)

    def build(self, df, col: str, weight_col: str) -> WSampleState:
        """Global fold — driver merges the P partial states (KB each;
        the bottom-k state is small enough that the sqrt(P) pre-merge
        the heavier sketches need would be pure fixed cost here below
        thousands of partitions)."""
        rows = self.partials(df, col, weight_col).collect()
        state = self.new_state()
        for r in rows:
            state = self.merge(state, self.from_bytes(bytes(r["state"])))
        return state

    def states_by_key(self, df, col: str, weight_col: str, keys):
        """Per-group merged states: DataFrame[keys..., state binary]."""
        import pandas as pd

        sk = self
        keys = tuple(keys)
        parts = self.partials(df, col, weight_col, keys)
        schema = ", ".join(f"{k} string" for k in keys) + ", state binary"

        def _final(pdf: pd.DataFrame) -> pd.DataFrame:
            state = sk.new_state()
            for b in pdf["state"]:
                state = sk.merge(state, sk.from_bytes(bytes(b)))
            out = {k: [pdf[k].iloc[0]] for k in keys}
            out["state"] = [sk.to_bytes(state)]
            return pd.DataFrame(out)

        return parts.groupBy(*keys).applyInPandas(_final, schema=schema)

    def merge_state_tables(self, tables, keys):
        """Fold persisted state tables (the ``states_by_key`` shape) —
        the incremental-update primitive; value-identical to one build
        over the concatenated inputs (bottom-k associativity)."""
        import pandas as pd

        sk = self
        keys = tuple(keys)
        if not tables:
            raise ValueError("merge_state_tables needs at least one table")
        df = tables[0]
        for t in tables[1:]:
            df = df.unionByName(t)
        schema = ", ".join(f"{k} string" for k in keys) + ", state binary"

        def _final(pdf: pd.DataFrame) -> pd.DataFrame:
            state = sk.new_state()
            for b in pdf["state"]:
                state = sk.merge(state, sk.from_bytes(bytes(b)))
            out = {k: [pdf[k].iloc[0]] for k in keys}
            out["state"] = [sk.to_bytes(state)]
            return pd.DataFrame(out)

        return df.groupBy(*keys).applyInPandas(_final, schema=schema)

    def sample(self, df, col: str, weight_col: str):
        """The resolved sample: DataFrame[col] of min(k, n_distinct)
        rows, weighted-without-replacement by ``weight_col``. Two scans,
        zero row shuffle (sample-then-resolve: broadcast semi-join on
        the retained hashes — ``theta.distinct_sample`` shape)."""
        from pyspark.sql import functions as F

        st = self.build(df, col, weight_col)
        hashes_df = df.sparkSession.createDataFrame(
            [(int(h.view(np.int64)),) for h in st.h], "h long"
        )
        hashed = F.xxhash64(
            F.lit(self.seed), F.col(col).cast("string")
        )
        return (
            df.select(col)
            .distinct()
            .join(F.broadcast(hashes_df), hashed == F.col("h"), "left_semi")
        )

    def sample_by_key(self, df, col: str, weight_col: str, keys):
        """Per-group resolved samples: DataFrame[keys..., col] with up
        to k values per group (``distinct_sample_by_key`` /
        ``theta.resolve_hash_values`` shape — the join is on the hash
        alone with group attribution from the state side, except here
        the hash carries the seed salt so the resolve mirrors
        ``_prepped`` instead of reusing the unsalted helper; keep G x k
        driver-sized — it equals the state table itself)."""
        keys = list(keys)
        if col in keys:
            raise ValueError(
                "col must differ from keys — a group's sample of itself"
                " is the group value; select it directly"
            )
        rows = self.states_by_key(df, col, weight_col, keys).collect()
        out = []
        for r in rows:
            st = self.from_bytes(bytes(r["state"]))
            for h in st.h:
                out.append(
                    tuple(r[kc] for kc in keys) + (int(h.view(np.int64)),)
                )
        schema = ", ".join(f"{kc} string" for kc in keys) + ", h long"
        hashes_df = df.sparkSession.createDataFrame(out, schema)
        # resolve joins on the SALTED hash — mirror the prep expression
        from pyspark.sql import functions as F

        cand = (
            df.select(col)
            .distinct()
            .withColumn(
                "h",
                F.xxhash64(F.lit(self.seed), F.col(col).cast("string")),
            )
        )
        return cand.join(F.broadcast(hashes_df), "h").select(*keys, col)
