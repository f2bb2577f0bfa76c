"""KMV / Theta distinct sketch with set operations (union / intersect / diff).

State: the k smallest *distinct* uint64 hash values seen (a deterministic
bottom-k sample of the key universe). Because "k smallest of a multiset
union" does not depend on arrival or merge order, the state — and therefore
every estimate — is fully deterministic for a given input set and hash,
and merge is commutative + associative (north-rule order-independence).

Estimator (Bar-Yossef et al. 2002 KMV; Dasgupta et al. 2016 theta
framework): with hashes mapped to x = (h+1)/2^64 in (0,1],

  |R| < k  ->  exact:  D = |R|
  |R| = k  ->  D^ = (k-1) / x_(k),  relative std err ~ 1/sqrt(k-2)

Set operations on two sketches (not a monoid op — a derived estimator):
theta = min over inputs of the sampling threshold (x_(k) if full, else 1);
restrict both retained sets to values below theta*2^64; then
|A op B| ^= |R_A op R_B| / theta. The restriction is what makes the
two samples comparable — both are uniform bottom samples at rate theta.

Reference analogue: minperf's distinct-set utilities
(``utils/RandomSetGenerator``, README.md:10 membership use-case); the
set-operation surface itself is the training-data question "how many
doc_ids / tokens do two sources share" at 10^12 scale, where the shuffle
carries only 8k-byte states.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .base import MergeableSketch

_HDR = struct.Struct("<4sII")  # magic, k, n_retained
_MAGIC = b"THE1"
_FULL_RANGE = float(2.0**64)


def _normalize(h_max) -> float:
    """Largest retained hash -> sampling threshold x_(k) in (0, 1]."""
    return (float(h_max) + 1.0) / _FULL_RANGE


@dataclass
class ThetaState:
    #: sorted distinct uint64 hashes, len <= k
    r: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.uint64))


class ThetaSketch(MergeableSketch):
    """Bottom-k distinct sketch over xxhash64(col) with set-op estimates."""

    input_kind = "hash"
    #: bottom-k of a set union is batch-split invariant: the threshold
    #: prune only skips hashes that could never enter, so the final
    #: sorted-distinct array is bit-identical however the stream is cut
    elementwise_update = True

    def __init__(self, k: int = 256) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k

    @property
    def relative_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 2)

    def approx_state_bytes(self) -> int:
        return _HDR.size + 8 * self.k

    # -- monoid ----------------------------------------------------------------
    def new_state(self) -> ThetaState:
        return ThetaState()

    def update(self, state: ThetaState, arr: np.ndarray) -> None:
        if len(arr) == 0:
            return
        h = np.ascontiguousarray(arr, dtype=np.int64).view(np.uint64)
        if len(state.r) == self.k:
            # threshold prune: once full, any hash >= the current k-th
            # minimum can never enter the bottom-k — an O(batch) filter
            # replaces the O((k+batch)log) sort for almost every value of
            # a long stream (same final state bit-for-bit: equal hash =
            # same element under set semantics)
            h = h[h < state.r[-1]]
            if len(h) == 0:
                return
        state.r = self._combine(state.r, np.unique(h))  # unique() sorts

    def _combine(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if len(a) == 0:
            merged = b
        elif len(b) == 0:
            merged = a
        else:
            merged = np.union1d(a, b)  # sorted distinct
        return merged[: self.k]

    def merge(self, a: ThetaState, b: ThetaState) -> ThetaState:
        return ThetaState(self._combine(a.r, b.r))

    def to_bytes(self, state: ThetaState) -> bytes:
        return _HDR.pack(_MAGIC, self.k, len(state.r)) + state.r.tobytes()

    def from_bytes(self, data: bytes) -> ThetaState:
        magic, k, n = _HDR.unpack_from(data, 0)
        if magic != _MAGIC or k != self.k:
            raise ValueError("theta state mismatch")
        out = np.frombuffer(data, dtype=np.uint64, offset=_HDR.size, count=n)
        return ThetaState(out.copy())

    def estimate(self, state: ThetaState) -> float:
        if len(state.r) < self.k:
            return float(len(state.r))
        return (self.k - 1) / _normalize(state.r[-1])

    # -- set operations ----------------------------------------------------------
    def _theta(self, state: ThetaState) -> float:
        return _normalize(state.r[-1]) if len(state.r) == self.k else 1.0

    def _restricted(self, a: ThetaState, b: ThetaState):
        # The cut is computed in uint64 space, NOT by round-tripping theta
        # through float64: for h_max >= 2^53 float(h_max)+1.0 == float(h_max)
        # and int(theta*2^64)-1 can drift ~2^11 from h_max, excluding the
        # defining sketch's own k-th element (or admitting foreign values
        # just above it). The inclusive cut IS the smaller full sketch's
        # h_max by integer compare; float only scales the final estimate.
        fulls = [st.r[-1] for st in (a, b) if len(st.r) == self.k]
        if not fulls:
            return a.r, b.r, 1.0
        cut = min(fulls)  # uint64 integer compare: exact
        return a.r[a.r <= cut], b.r[b.r <= cut], _normalize(cut)

    def union_estimate(self, a: ThetaState, b: ThetaState) -> float:
        return self.estimate(self.merge(a, b))

    def intersect_estimate(self, a: ThetaState, b: ThetaState) -> float:
        ra, rb, theta = self._restricted(a, b)
        return len(np.intersect1d(ra, rb)) / theta

    def difference_estimate(self, a: ThetaState, b: ThetaState) -> float:
        """|A \\ B| estimate."""
        ra, rb, theta = self._restricted(a, b)
        return len(np.setdiff1d(ra, rb)) / theta

    def jaccard_estimate(self, a: ThetaState, b: ThetaState) -> float:
        ra, rb, theta = self._restricted(a, b)
        u = len(np.union1d(ra, rb))
        if u == 0:
            return 0.0
        return len(np.intersect1d(ra, rb)) / u

    # -- convenience ---------------------------------------------------------------
    def count_distinct(self, df, col: str) -> float:
        return self.estimate(self.build(df, col))

    _PAIRS_SCHEMA = (
        "key_a string, key_b string, union_est double,"
        " inter_est double, jaccard_est double"
    )

    def _pair_rows(self, ga: list, gb: list | None):
        """Estimate rows for group-list x group-list (or within one list).

        ``gb is None`` -> all i<j pairs within ``ga``; else every cross
        combination, emitted with (min_key, max_key) orientation so each
        unordered pair appears exactly once with a deterministic layout."""
        out = []
        if gb is None:
            ga = sorted(ga, key=lambda kv: kv[0])
            combos = [
                (ga[i], ga[j])
                for i in range(len(ga))
                for j in range(i + 1, len(ga))
            ]
        else:
            combos = [
                ((ka, sa), (kb, sb)) if ka < kb else ((kb, sb), (ka, sa))
                for ka, sa in ga
                for kb, sb in gb
            ]
        for (ka, sa), (kb, sb) in combos:
            out.append(
                (
                    ka,
                    kb,
                    float(self.union_estimate(sa, sb)),
                    float(self.intersect_estimate(sa, sb)),
                    float(self.jaccard_estimate(sa, sb)),
                )
            )
        return out

    def pairwise_set_estimates(self, df, col: str, key: str,
                               max_driver_groups: int = 1024,
                               ngram: int | None = None):
        """All-pairs group overlap: DataFrame[key_a, key_b, union_est,
        inter_est, jaccard_est] for every unordered pair of ``key`` groups.

        One distributed pass builds a state per group (states_by_key). Up
        to ``max_driver_groups`` groups the G(G-1)/2 pair estimates run on
        the driver (numpy set ops on <= k elements each — fine to ~10^3
        groups at <= 8k+16 bytes per state). Beyond that the pairs run
        DISTRIBUTED via ``pairwise_set_estimates_distributed`` — identical
        rows, block-parallel. Estimates are deterministic functions of the
        (deterministic) states, so both paths agree exactly."""
        # persist: the G-row states relation is tiny but its lineage is the
        # full data-sized aggregation — without caching, the count plus the
        # collect (or the self-join's two sides) would re-run that scan
        states = self.states_by_key(df, col, (key,), ngram=ngram).persist()
        g = states.count()
        if g > max_driver_groups:
            return self._pairwise_distributed(states, key, g)
        try:
            groups = [
                (r[key], self.from_bytes(bytes(r["state"]))) for r in states.collect()
            ]
        finally:
            states.unpersist()
        return df.sparkSession.createDataFrame(
            self._pair_rows(groups, None), self._PAIRS_SCHEMA
        )

    def pairwise_set_estimates_distributed(self, df, col: str, key: str,
                                           n_blocks: int | None = None,
                                           ngram: int | None = None):
        """Distributed all-pairs group overlap (many-groups path).

        Block nested-loop over STATES, not rows: groups are hashed into
        B ~ sqrt(G) blocks, each block's states are packed into one row
        (distributed ``applyInPandas`` — no state ever visits the
        driver), and the B(B+1)/2 block pairs fan out as tasks — each
        task deserializes 2 blocks (~G/B states) and emits its pair
        estimates. The shuffle carries each state B times
        (G x B x state_bytes total), NOT G^2 rows of state pairs; at
        G=10^4, k=256 that is ~2 GB spread over tasks vs ~100 GB for a
        row-level cross join. Output rows are identical to the driver
        path (same estimator on the same states; (min,max) key
        orientation)."""
        states = self.states_by_key(df, col, (key,), ngram=ngram).persist()  # see above
        return self._pairwise_distributed(states, key, states.count(), n_blocks)

    def _pairwise_distributed(self, states, key: str, g: int,
                              n_blocks: int | None = None):
        import math

        import pandas as pd

        from pyspark.sql import functions as F

        spark = states.sparkSession
        sk = self
        if g < 2:
            # both public entry points persist states before calling here —
            # release it on the early return too, or the cached relation
            # stays pinned in the block managers for the session lifetime
            states.unpersist()
            return spark.createDataFrame([], self._PAIRS_SCHEMA)
        b = n_blocks or max(2, math.isqrt(g))

        def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
            order = pdf[key].argsort()
            return pd.DataFrame(
                {
                    "blk": [int(pdf["blk"].iloc[0])],
                    "keys": [pdf[key].iloc[order].tolist()],
                    "states": [[bytes(s) for s in pdf["state"].iloc[order]]],
                }
            )

        packed = (
            states.withColumn(
                "blk", F.pmod(F.xxhash64(F.col(key)), F.lit(b)).cast("int")
            )
            .groupBy("blk")
            .applyInPandas(
                _pack, schema="blk int, keys array<string>, states array<binary>"
            )
            # eager materialization cuts the lineage to the (persisted)
            # states relation, which can then be released immediately —
            # otherwise every _pairwise call would pin a cached relation
            # for the session lifetime (review finding)
            .localCheckpoint()
        )
        states.unpersist()

        a, c = packed.alias("a"), packed.alias("b")
        joined = a.join(
            F.broadcast(c), F.col("a.blk") <= F.col("b.blk"), "inner"
        ).select(
            F.col("a.blk").alias("blk_a"),
            F.col("a.keys").alias("keys_a"),
            F.col("a.states").alias("states_a"),
            F.col("b.blk").alias("blk_b"),
            F.col("b.keys").alias("keys_b"),
            F.col("b.states").alias("states_b"),
        ).repartition(max(2, b * (b + 1) // 2 // 4))

        def _pairs(batches):
            for pdf in batches:
                rows_out: list[tuple] = []
                # rows here are BLOCK PAIRS (~B^2/2 ≈ G/2 total), not data,
                # so plain zip iteration is fine — but itertuples/zip beats
                # iterrows' per-row Series construction anyway
                for blk_a, keys_a, states_a, blk_b, keys_b, states_b in zip(
                    pdf["blk_a"], pdf["keys_a"], pdf["states_a"],
                    pdf["blk_b"], pdf["keys_b"], pdf["states_b"],
                ):
                    ga = [
                        (k, sk.from_bytes(bytes(s)))
                        for k, s in zip(keys_a, states_a)
                    ]
                    if blk_a == blk_b:
                        rows_out.extend(sk._pair_rows(ga, None))
                    else:
                        gb = [
                            (k, sk.from_bytes(bytes(s)))
                            for k, s in zip(keys_b, states_b)
                        ]
                        rows_out.extend(sk._pair_rows(ga, gb))
                if rows_out:
                    yield pd.DataFrame(
                        rows_out,
                        columns=[
                            "key_a", "key_b", "union_est", "inter_est",
                            "jaccard_est",
                        ],
                    )

        return joined.mapInPandas(_pairs, schema=self._PAIRS_SCHEMA)


def distinct_sample(df, col: str, k: int = 256):
    """Deterministic uniform sample of ``k`` DISTINCT values of ``col``,
    with the values resolved — DataFrame[col] of min(k, n_distinct) rows.

    The bottom-k retained set of a theta sketch IS a uniform sample of
    the distinct-value universe (each distinct value's xxhash64 is an
    i.i.d. uniform draw; keeping the k smallest selects a simple random
    subset, independent of duplication counts and arrival order). Two
    scans, zero rows shuffled: scan 1 folds the bottom-k hash state
    (states-not-rows), scan 2 resolves hashes back to values with a
    broadcast semi-join on the k retained hashes — the classic
    sample-then-resolve shape that works unchanged at 10^12 rows.

    Deterministic: same input set -> same sample (and the sample of a
    union of corpora is the bottom-k merge of their states, so samples
    taken per-ingest-batch stay consistent under merging).

    Training-data use: "pull 1,000 uniformly sampled documents for
    manual QA" without a full-table orderBy(rand()) sort.
    """
    from pyspark.sql import functions as F

    sk = ThetaSketch(k=max(8, k))
    st = sk.build(df, col)
    kept = st.r[:k]
    hashes_df = df.sparkSession.createDataFrame(
        [(int(h.view(np.int64)),) for h in kept], "h long"
    )
    hashed = F.xxhash64(F.col(col).cast("string"))
    return (
        df.select(col)
        .distinct()
        .join(F.broadcast(hashes_df), hashed == F.col("h"), "left_semi")
    )


def resolve_hash_values(df, col: str, hashes_df, keys, hcol: str = "h"):
    """Resolve per-key hash rows (``hashes_df``: keys... string, hcol
    long) back to VALUES by scanning ``df`` — DataFrame[keys..., col].

    Values match on the 64-bit hash ALONE (the stack-wide no-collision
    assumption): a hash retained under a key was folded from that key's
    rows, so its unique preimage in ``df`` IS that key's value — the
    group attribution comes from the state-side rows. The df key
    columns are deliberately NOT re-stringified and joined: the state
    tables hold Python-``str`` key forms (``multi._stage1_by_key``)
    while Spark's CAST disagrees for booleans ('True' vs 'true'),
    floats ('1e-09' vs '1.0E-9') and NULL — a cast-side key-equality
    join silently drops those groups. One narrow distinct of the
    resolve column + a broadcast join; the state-side relation stays
    driver/broadcast-sized (G x k)."""
    from pyspark.sql import functions as F

    keys = list(keys)
    cand = (
        df.select(col)
        .distinct()
        .withColumn(hcol, F.xxhash64(F.col(col).cast("string")))
    )
    return cand.join(F.broadcast(hashes_df), hcol).select(*keys, col)


def distinct_sample_by_key(df, col: str, keys, k: int = 64):
    """Per-group deterministic uniform distinct samples —
    DataFrame[keys..., col] with up to ``k`` sampled values per group.

    Grouped variant of :func:`distinct_sample`: scan 1 builds per-group
    bottom-k states (one ``states_by_key`` pass), the driver explodes
    them into a (keys..., hash) relation of at most G x k rows (exactly
    the state-table size it already collected), and scan 2 resolves
    values via :func:`resolve_hash_values`. Keep G x k driver-sized (it
    is the same footprint as the per-key state table itself); for very
    large G, sample coarser groups or lower k.
    """
    keys = list(keys)
    sk = ThetaSketch(k=max(8, k))
    rows = sk.states_by_key(df, col, keys).collect()
    out = []
    for r in rows:
        st = sk.from_bytes(bytes(r["state"]))
        for h in st.r[:k]:
            out.append(tuple(r[kc] for kc in keys) + (int(h.view(np.int64)),))
    schema = ", ".join(f"{kc} string" for kc in keys) + ", h long"
    hashes_df = df.sparkSession.createDataFrame(out, schema)
    return resolve_hash_values(df, col, hashes_df, keys)
