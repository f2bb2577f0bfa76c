"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as pure Column expressions (zip_with +
aggregate — JVM, codegen, no Python). Scale path: IVF (inverted-file) —
k-means centroids fitted on a driver-side sample, every vector assigned to
its nearest centroid JVM-side-ish (small pandas UDF), queries probe the
top-p closest centroid buckets only; at 1000 executors the probe filter is
a partition-prunable predicate over the centroid-id column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _cosine_expr(vec_col, qvec):
    from pyspark.sql import functions as F

    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nq = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (nv * F.lit(nq))


def brute_force_topk(df, vec_col: str, query: np.ndarray, k: int = 10):
    """Exact cosine top-k: one scan, JVM-side arithmetic, global top-k via
    TakeOrderedAndProject (no full sort)."""
    from pyspark.sql import functions as F

    return (
        df.withColumn("cosine", _cosine_expr(vec_col, np.asarray(query, dtype=np.float64)))
        .orderBy(F.desc("cosine"))
        .limit(k)
    )


def _make_assign_fn(bcast):
    """Centroid-assignment batch fn closing over ONLY the broadcast handle.

    Factored out so the closure's pickled size is testable: a Broadcast
    pickles as a tiny id reference, so the task binary stays KB-sized no
    matter how large the centroid matrix is (the matrix itself moves once
    per executor via the broadcast mechanism)."""

    def _assign(v: pd.Series) -> pd.Series:
        cent_t = bcast.value
        x = np.array(v.tolist(), dtype=np.float32)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), np.float32(1e-12))
        return pd.Series((x @ cent_t).argmax(axis=1).astype(np.int32))

    return _assign


class IVFIndex:
    """Inverted-file ANN: sample -> k-means centroids -> bucketed table.

    ``fit`` samples vectors to the driver and runs a few Lloyd iterations in
    numpy; ``assign`` adds a centroid-id column (vectorized pandas UDF, one
    matmul per Arrow batch); ``search`` probes the ``nprobe`` nearest
    centroid buckets and brute-forces inside them.
    """

    def __init__(
        self,
        n_centroids: int | str = "auto",
        nprobe: int = 4,
        iters: int = 10,
        seed: int = 7,
    ):
        #: "auto" -> sqrt(n) at fit time (the standard IVF operating point:
        #: balances bucket count against per-bucket scan; at 10^12 vectors
        #: that is ~10^6 centroids, each bucket ~10^6 vectors)
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, df, vec_col: str, sample_size: int = 20_000) -> "IVFIndex":
        n = df.count()
        if self.n_centroids == "auto":
            self.n_centroids = max(1, int(np.sqrt(n)))
            sample_size = max(sample_size, 40 * self.n_centroids)
        frac = min(1.0, sample_size / max(1, n))
        rows = df.select(vec_col).sample(frac, seed=self.seed).collect()
        x = np.array([r[0] for r in rows], dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(self.seed)
        c = x[rng.choice(len(x), size=min(self.n_centroids, len(x)), replace=False)]
        for _ in range(self.iters):
            sims = x @ c.T
            assign = sims.argmax(axis=1)
            for j in range(len(c)):
                m = assign == j
                if m.any():
                    v = x[m].mean(axis=0)
                    c[j] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = c
        old = getattr(self, "_bcast", None)
        if old is not None:  # refit invalidates the cached broadcast
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — originating context may be gone
                pass
            self._bcast = None
            self._bcast_sc = None
        return self

    def assign(self, df, vec_col: str, out_col: str = "centroid_id"):
        """Add the nearest-centroid id column.

        The centroid matrix rides an EXPLICIT ``sparkContext.broadcast``
        (torrent-distributed once per executor, unpickled once per worker
        process), NOT the UDF closure: a closure ships with every task
        binary, and at the auto-sqrt(n) operating point the matrix is
        task-prohibitive (10^6 centroids x 768 dims ≈ 3 GB even at
        float32). float32 halves both the broadcast and the per-batch
        matmul traffic; assignment only compares similarity ranks, so the
        precision loss is immaterial (ties are already arbitrary centroid
        choices)."""
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import IntegerType

        if self.centroids is None:
            raise RuntimeError("fit() first")
        # one broadcast per fitted index, reused across assign() calls —
        # re-broadcasting a multi-GB matrix per call would pin a fresh copy
        # in every block manager for the session lifetime. Keyed on the
        # SparkContext: a cached broadcast from a stopped/replaced session
        # would fail on the executors of the new one (review finding)
        sc = df.sparkSession.sparkContext
        bcast = getattr(self, "_bcast", None)
        if bcast is None or getattr(self, "_bcast_sc", None) is not sc:
            bcast = sc.broadcast(
                np.ascontiguousarray(self.centroids.T, dtype=np.float32)
            )
            self._bcast = bcast
            self._bcast_sc = sc
        _assign = pandas_udf(_make_assign_fn(bcast), IntegerType())
        return df.withColumn(out_col, _assign(vec_col))

    def __getstate__(self):
        # Broadcast handles are not driver-side picklable and are
        # session-bound anyway: drop the cache so a fitted index can be
        # pickled/deep-copied and will re-broadcast lazily after load
        state = self.__dict__.copy()
        state.pop("_bcast", None)
        state.pop("_bcast_sc", None)
        return state

    def search(self, indexed_df, vec_col: str, query: np.ndarray, k: int = 10,
               centroid_col: str = "centroid_id"):
        """Top-k within the nprobe nearest centroid buckets. The IN-filter
        on the centroid column prunes before any vector math (and prunes
        partitions when the table is written partitioned by centroid_id)."""
        from pyspark.sql import functions as F

        q = np.asarray(query, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        probe = np.argsort(-(self.centroids @ qn))[: self.nprobe].tolist()
        return (
            indexed_df.filter(F.col(centroid_col).isin(probe))
            .withColumn("cosine", _cosine_expr(vec_col, q))
            .orderBy(F.desc("cosine"))
            .limit(k)
        )
