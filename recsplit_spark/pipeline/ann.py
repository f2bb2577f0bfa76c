"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as pure Column expressions (zip_with +
aggregate — JVM, codegen, no Python). Scale path: IVF (inverted-file) —
k-means centroids fitted either on a driver-side Arrow-gathered sample
(small k) or fully distributed (large k: hash-ordered seeding + Lloyd
rounds as mapInArrow partial-sum kernels, the driver touching only the
k x d centroid matrix); every vector is assigned to its nearest centroid
by a vectorized pandas UDF, and queries probe the top-``nprobe`` closest
centroid buckets only. At 1000 executors the probe filter is a
partition-prunable predicate over the centroid-id column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: elements (rows x centroids) per score-matrix chunk in the assignment
#: matmul: bounds the per-batch working set so 32-way executor concurrency
#: doesn't blow aggregate DRAM (same rationale as kernel.CHUNK_ELEMS) and
#: keeps assignment viable at large k, where an unchunked Arrow batch of
#: 10k rows x 10^6 centroids would materialize a 40 GB score matrix
_SCORE_CHUNK_ELEMS = 1 << 20

#: fit() runs the driver-side Lloyd path up to this many centroids; above
#: it the distributed path is used (driver Lloyd is O(sample * k * d)
#: flops with sample >= 40k vectors — past ~1k centroids the driver is the
#: bottleneck and the sample no longer fits a single machine comfortably)
_DRIVER_FIT_MAX_K = 1024

#: distributed fit: partial-sum dict entries per kernel partition before a
#: flush — bounds worker memory to ~cap x d float64 regardless of how many
#: distinct centroids a partition touches (the groupBy-cid reduce merges
#: flushed fragments)
_FIT_FLUSH_ENTRIES = 1 << 16


def _list_col_to_matrix(col, dtype=np.float32) -> np.ndarray:
    """pyarrow (Chunked)Array of list<float> -> contiguous (n, d) matrix.

    Zero-copy flatten of the Arrow list buffer (no per-row Python), with a
    fixed-width check: ragged embedding columns are a data bug and must
    fail loudly, not silently mis-reshape."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("embedding column is ragged (fixed dim required)")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    out = np.ascontiguousarray(flat.reshape(n, d), dtype=dtype)
    if not out.flags.writeable:  # zero-copy of an Arrow buffer is read-only
        out = out.copy()
    return out


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    x /= np.maximum(
        np.linalg.norm(x, axis=1, keepdims=True), x.dtype.type(1e-12)
    )
    return x


def _chunked_argmax_scores(x: np.ndarray, cent_t: np.ndarray) -> np.ndarray:
    """argmax_j (x @ cent_t)[:, j] with the score matrix chunked to
    _SCORE_CHUNK_ELEMS elements (see above)."""
    k = cent_t.shape[1]
    rows = max(1, _SCORE_CHUNK_ELEMS // max(1, k))
    if len(x) <= rows:
        return (x @ cent_t).argmax(axis=1)
    out = np.empty(len(x), dtype=np.int64)
    for lo in range(0, len(x), rows):
        hi = min(len(x), lo + rows)
        out[lo:hi] = (x[lo:hi] @ cent_t).argmax(axis=1)
    return out


def _chunked_topq_scores(x: np.ndarray, cent_t: np.ndarray, q: int) -> np.ndarray:
    """(n, q) ids of the q highest-scoring centroids per row, chunked like
    ``_chunked_argmax_scores``. Position 0 is the ARGMAX bucket (the id
    ``assign`` would produce — callers partition by it); the remaining
    q-1 ids are the rest of the probe set, unordered (argpartition)."""
    k = cent_t.shape[1]
    q = min(q, k)
    rows = max(1, _SCORE_CHUNK_ELEMS // max(1, k))
    out = np.empty((len(x), q), dtype=np.int64)
    for lo in range(0, len(x), rows):
        hi = min(len(x), lo + rows)
        s = x[lo:hi] @ cent_t
        if q >= k:
            ids = np.broadcast_to(
                np.arange(k, dtype=np.int64), (hi - lo, k)
            ).copy()
        else:
            ids = np.argpartition(-s, q - 1, axis=1)[:, :q]
        # swap the argmax (among the q candidates) to position 0
        r = np.arange(hi - lo)
        best = np.take_along_axis(s, ids, axis=1).argmax(axis=1)
        ids[r, 0], ids[r, best] = ids[r, best], ids[r, 0].copy()
        out[lo:hi] = ids
    return out


def _make_assign_probes_fn(bcast, q: int):
    """Like ``_make_assign_fn`` but returns the TOP-q probe bucket ids per
    vector as a list column — the multi-probe candidate feed for
    semantic dedup (same broadcast-only closure discipline)."""

    def _probes(v: pa.Array) -> pa.Array:
        cent_t = bcast.value
        x = _normalize_rows(_list_col_to_matrix(v, np.float32))
        n = len(x)
        qq = min(q, cent_t.shape[1])
        if n == 0:
            ids = np.empty(0, dtype=np.int32)
        else:
            ids = _chunked_topq_scores(x, cent_t, qq).astype(np.int32).reshape(-1)
        offsets = pa.array(
            np.arange(n + 1, dtype=np.int32) * np.int32(qq), type=pa.int32()
        )
        return pa.ListArray.from_arrays(offsets, pa.array(ids, type=pa.int32()))

    return _probes


def bucket_pairs_above(left, right, threshold: float, self_pairs: bool = False):
    """DataFrame[id_a, id_b]: all pairs with cosine >= ``threshold``
    between two bucketed relations ``left(id_a, __va, centroid_id)`` and
    ``right(id_b, __vb, centroid_id)``, computed per bucket with ONE
    chunked BLAS matmul per (left-bucket x right-bucket) via a cogrouped
    ``applyInPandas`` kernel.

    This is the scale path for semantic dedup: sub-threshold candidate
    pairs never materialize as rows, and each vector crosses the shuffle
    once per bucket membership — never once per candidate pair (the
    naive join + per-pair ``zip_with`` cosine ships two d-float arrays
    per pair; measured 185 vectors/s at 400k x 64d vs the matmul path).
    ``self_pairs=True`` is the within-population mode (both sides carry
    the same ids): emits ``id_a < id_b`` only. Multi-probe callers
    ``.distinct()`` the result (a pair found in two shared buckets)."""
    import pandas as pd

    t = float(threshold)

    def _pairs(l, r) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        ida = l["id_a"].to_numpy()
        idb = r["id_b"].to_numpy()
        a = _normalize_rows(np.stack(l["__va"].to_numpy()).astype(np.float32))
        b = _normalize_rows(np.stack(r["__vb"].to_numpy()).astype(np.float32))
        bt = np.ascontiguousarray(b.T)
        rows = max(1, _SCORE_CHUNK_ELEMS // max(1, len(b)))
        out_a, out_b = [], []
        for lo in range(0, len(a), rows):
            hi = min(len(a), lo + rows)
            s = a[lo:hi] @ bt
            ii, jj = np.nonzero(s >= t)
            pa_ids = ida[lo + ii]
            pb_ids = idb[jj]
            if self_pairs:
                keep = pa_ids < pb_ids
                pa_ids, pb_ids = pa_ids[keep], pb_ids[keep]
            out_a.append(pa_ids)
            out_b.append(pb_ids)
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return (
        left.groupBy("centroid_id")
        .cogroup(right.groupBy("centroid_id"))
        .applyInPandas(lambda l, r: _pairs(l, r), "id_a long, id_b long")
    )


def _cosine_cols(a_col, b_col):
    """Column-column cosine similarity over two ``array<float>`` columns —
    pure Column exprs (``zip_with`` dot + per-side norms), no Python."""
    from pyspark.sql import functions as F

    dot = F.aggregate(
        F.zip_with(F.col(a_col), F.col(b_col), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.col(a_col), F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(F.col(b_col), F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.greatest(na * nb, F.lit(1e-12))


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
    per executor via the broadcast mechanism).

    Arrow-native (``arrow_udf``, round 4): the list column flattens
    zero-copy to the (n, d) matrix — the old pandas path paid a per-ROW
    ``tolist`` Python loop on the assign scan, which at 100 TB is the
    whole table."""

    def _assign(v: pa.Array) -> pa.Array:
        cent_t = bcast.value
        x = _normalize_rows(_list_col_to_matrix(v, np.float32))
        if len(x) == 0:
            return pa.array(np.empty(0, dtype=np.int32), type=pa.int32())
        return pa.array(
            _chunked_argmax_scores(x, cent_t).astype(np.int32), type=pa.int32()
        )

    return _assign


def _make_fit_partial_fn(bcast):
    """One-pass Lloyd-round kernel for ``mapInArrow``: assign each vector
    to its nearest centroid AND accumulate per-centroid (count, sum)
    partials, emitting one row per centroid seen (flushed in bounded
    fragments). No per-row Python: the list column flattens zero-copy to
    a matrix, assignment is a chunked matmul, and the per-centroid sums
    are a sort + ``np.add.reduceat``."""

    def _partial(batches):
        cent_t = bcast.value
        acc: dict[int, list] = {}  # cid -> [count, sum_vec float64]

        def _flush():
            if not acc:
                return None
            cids = np.fromiter(acc.keys(), dtype=np.int32, count=len(acc))
            ns = np.fromiter(
                (e[0] for e in acc.values()), dtype=np.int64, count=len(acc)
            )
            blobs = [e[1].tobytes() for e in acc.values()]
            acc.clear()
            return pa.record_batch(
                [pa.array(cids), pa.array(ns), pa.array(blobs, type=pa.binary())],
                names=["cid", "n", "s"],
            )

        for b in batches:
            x = _normalize_rows(_list_col_to_matrix(b.column(0), np.float32))
            if not len(x):
                continue
            a = _chunked_argmax_scores(x, cent_t)
            order = np.argsort(a, kind="stable")
            cs = a[order]
            xs = x[order].astype(np.float64)
            starts = np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1])
            sums = np.add.reduceat(xs, starts, axis=0)
            counts = np.diff(np.append(starts, len(cs)))
            for cid, cnt, sv in zip(cs[starts], counts, sums):
                e = acc.get(int(cid))
                if e is None:
                    acc[int(cid)] = [int(cnt), sv.copy()]
                else:
                    e[0] += int(cnt)
                    e[1] += sv
            if len(acc) >= _FIT_FLUSH_ENTRIES:
                out = _flush()
                if out is not None:
                    yield out
        out = _flush()
        if out is not None:
            yield out

    return _partial


def _reduce_cid_partials(pdf: pd.DataFrame) -> pd.DataFrame:
    """groupBy(cid) reduce: merge one centroid's partial (count, sum)
    fragments (at most one per flushed kernel fragment) into one row."""
    vecs = [np.frombuffer(bytes(s), dtype=np.float64) for s in pdf["s"]]
    total = vecs[0].copy()
    for v in vecs[1:]:
        total += v
    return pd.DataFrame(
        {
            "cid": [int(pdf["cid"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "s": [total.tobytes()],
        }
    )


class IVFIndex:
    """Inverted-file ANN: k-means centroids -> bucketed table.

    ``fit`` trains centroids — driver-side numpy Lloyd over an
    Arrow-gathered sample for small k, or fully distributed (see
    ``_fit_distributed``) above ``_DRIVER_FIT_MAX_K``; ``assign`` adds a
    centroid-id column (vectorized pandas UDF, one chunked matmul per
    Arrow batch); ``search`` probes the ``nprobe`` nearest centroid
    buckets and brute-forces inside them.
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

    def fit(
        self,
        df,
        vec_col: str,
        sample_size: int = 20_000,
        mode: str = "auto",
    ) -> "IVFIndex":
        """Train the centroids.

        ``mode='driver'``: sample -> ONE Arrow gather (8 B/elem columnar
        buffers, no Row objects) -> vectorized numpy Lloyd (scatter-add
        centroid update, no Python loop over centroids). Right up to
        ~``_DRIVER_FIT_MAX_K`` centroids.

        ``mode='distributed'``: hash-ordered deterministic seeding + Lloyd
        rounds where each round is one scan (``mapInArrow`` partial sums)
        + one ~k-row shuffle (groupBy cid) — the driver only ever holds
        the k x d centroid matrix, which it must hold anyway to broadcast
        for ``assign``. This is the path that reaches the auto-sqrt(n)
        operating point (10^6 centroids at 10^12 vectors): sample_size
        grows to 40k vectors ≈ 10^7·d floats, which stays a DataFrame —
        never driver-resident.

        ``mode='auto'`` picks by centroid count."""
        if mode not in ("auto", "driver", "distributed"):
            raise ValueError(f"unknown fit mode {mode!r}")
        n = df.count()
        if self.n_centroids == "auto":
            self.n_centroids = max(1, int(np.sqrt(n)))
            sample_size = max(sample_size, 40 * self.n_centroids)
        if mode == "auto":
            mode = (
                "distributed"
                if self.n_centroids > _DRIVER_FIT_MAX_K
                else "driver"
            )
        if mode == "driver":
            self._fit_driver(df, vec_col, sample_size, n)
        else:
            self._fit_distributed(df, vec_col, sample_size, n)
        old = getattr(self, "_bcast", None)
        if old is not None:  # refit invalidates the cached broadcast
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — originating context may be gone
                pass
            self._bcast = None
            self._bcast_sc = None
        return self

    def _fit_driver(self, df, vec_col: str, sample_size: int, n: int) -> None:
        frac = min(1.0, sample_size / max(1, n))
        tbl = df.select(vec_col).sample(frac, seed=self.seed).toArrow()
        x = _list_col_to_matrix(tbl.column(0), np.float64)
        _normalize_rows(x)
        rng = np.random.default_rng(self.seed)
        k = min(self.n_centroids, len(x))
        c = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(self.iters):
            assign = _chunked_argmax_scores(x, c.T)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k)
            nz = counts > 0
            c[nz] = sums[nz] / counts[nz, None]
            _normalize_rows(c)
        self.centroids = c

    def _fit_distributed(self, df, vec_col: str, sample_size: int, n: int) -> None:
        """Distributed spherical k-means (k-means with renormalized means).

        Seeding: the k lowest ``xxhash64(vec, seed)`` vectors — a
        deterministic uniform draw independent of partitioning. A naive
        ``orderBy(h).limit(k)`` plans as TakeOrdered, whose driver merge
        holds up to k rows PER PARTITION (k x P vectors at the auto
        operating point — a driver killer); instead a hash-threshold
        filter keeps ~8x the needed mass (a tiny fraction of the scan),
        and the global k-smallest-of-the-filtered sort touches only that
        remnant. The threshold doubles and retries in the (exponentially
        unlikely) event the filter catches fewer than k rows. Each Lloyd
        round = one training scan emitting per-centroid (count, sum)
        partials + a groupBy(cid) reduce whose output is <= k rows,
        Arrow-gathered. Empty clusters keep their previous centroid.
        Per-round float32 centroid broadcasts are unpersisted as soon as
        the round's gather lands.

        NOTE on the assignment cost: nearest-of-k by brute force is
        O(k·d) per vector; at k=10^6 production systems use a coarse
        quantizer (hierarchical / HNSW over the centroids) for the inner
        argmax — here the matmul is chunked (``_SCORE_CHUNK_ELEMS``) so
        it is memory-safe at any k, just not sublinear in k."""
        from pyspark.sql import functions as F

        spark = df.sparkSession
        sc = spark.sparkContext
        vec = df.select(F.col(vec_col).alias("v"))
        frac = min(1.0, sample_size / max(1, n))
        train = vec if frac >= 1.0 else vec.sample(frac, seed=self.seed)
        train = train.persist()
        try:
            k = self.n_centroids
            n_train_est = max(1, int(frac * n))
            hashed = train.select(
                "v", F.xxhash64(F.col("v"), F.lit(self.seed)).alias("__h")
            )
            # k smallest hashes via threshold filter (see docstring): keep
            # h below the ~8k/n quantile of the uniform int64 hash range
            mult = 8.0
            seed_tbl = None
            for _ in range(4):
                keep_frac = mult * k / n_train_est
                if keep_frac >= 1.0:
                    cand = hashed  # filter would keep everything anyway
                else:
                    cutoff = int(-(2**63) + 2.0**64 * keep_frac)
                    cand = hashed.filter(F.col("__h") < F.lit(cutoff))
                # exact k-th smallest hash from the HASH column alone
                # (8 B/row: ~mult*k rows ≈ 64 MB at k=10^6), so the only
                # vector gather is the final <= ~k-row one — never the
                # ~mult*k remnant through a TakeOrdered driver merge
                harr = (
                    cand.select("__h")
                    .toArrow()
                    .column("__h")
                    .to_numpy(zero_copy_only=False)
                )
                if len(harr) >= min(k, n_train_est) or keep_frac >= 1.0:
                    kth = (
                        np.partition(harr, k - 1)[k - 1]
                        if len(harr) > k
                        else (harr.max() if len(harr) else 0)
                    )
                    seed_tbl = (
                        hashed.filter(F.col("__h") <= F.lit(int(kth)))
                        .orderBy("__h")
                        .limit(k)
                        .select("v")
                        .toArrow()
                    )
                    break
                mult *= 4.0
            if seed_tbl is None:  # pathological: use whatever the filter kept
                seed_tbl = (
                    cand.orderBy("__h").limit(k).select("v").toArrow()
                )
            c = _list_col_to_matrix(seed_tbl.column(0), np.float64)
            if len(c) == 0:
                raise ValueError("cannot fit IVF on an empty DataFrame")
            _normalize_rows(c)
            k = len(c)  # fewer training vectors than requested centroids
            for _ in range(self.iters):
                bcast = sc.broadcast(
                    np.ascontiguousarray(c.T, dtype=np.float32)
                )
                try:
                    partials = train.mapInArrow(
                        _make_fit_partial_fn(bcast),
                        schema="cid int, n long, s binary",
                    )
                    reduced = (
                        partials.groupBy("cid")
                        .applyInPandas(
                            _reduce_cid_partials,
                            schema="cid int, n long, s binary",
                        )
                        .toArrow()
                    )
                finally:
                    # a failed round must not pin ~k*d*4 bytes of centroids
                    # in every executor for the session lifetime
                    bcast.unpersist()
                cids = reduced.column("cid").to_numpy(zero_copy_only=False)
                ns = reduced.column("n").to_numpy(zero_copy_only=False)
                blobs = reduced.column("s").to_pylist()
                c_new = c.copy()  # empty clusters keep their centroid
                for cid, cnt, blob in zip(cids, ns, blobs):
                    c_new[cid] = np.frombuffer(blob, dtype=np.float64) / cnt
                _normalize_rows(c_new)
                c = c_new
            self.centroids = c
        finally:
            train.unpersist()

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
        from pyspark.sql.functions import arrow_udf
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
        _assign = arrow_udf(_make_assign_fn(bcast), IntegerType())
        return df.withColumn(out_col, _assign(vec_col))

    def assign_probes(self, df, vec_col: str, probes: int,
                      out_col: str = "probe_ids"):
        """Add an ``array<int>`` column of the ``probes`` nearest centroid
        ids per vector — the multi-probe bucket set (same broadcast
        discipline as ``assign``; ids within the set are unordered)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import ArrayType, IntegerType

        if self.centroids is None:
            raise RuntimeError("fit() first")
        sc = df.sparkSession.sparkContext
        bcast = getattr(self, "_bcast", None)
        if bcast is None or getattr(self, "_bcast_sc", None) is not sc:
            bcast = sc.broadcast(
                np.ascontiguousarray(self.centroids.T, dtype=np.float32)
            )
            self._bcast = bcast
            self._bcast_sc = sc
        _probes = arrow_udf(
            _make_assign_probes_fn(bcast, probes), ArrayType(IntegerType())
        )
        return df.withColumn(out_col, _probes(vec_col))

    def __getstate__(self):
        # Broadcast handles are not driver-side picklable and are
        # session-bound anyway: drop the cache so a fitted index can be
        # pickled/deep-copied and will re-broadcast lazily after load
        state = self.__dict__.copy()
        state.pop("_bcast", None)
        state.pop("_bcast_sc", None)
        return state

    # -- persistence ----------------------------------------------------------
    def save(self, spark, path: str, mode: str = "error") -> None:
        """Persist the fitted index: ``<path>/centroids`` (one row per
        centroid: cid int, vector array<float>) + ``<path>/meta``. A fit
        at the auto-sqrt(n) operating point costs ``iters`` full scans —
        the index must outlive the session. The centroid matrix is
        driver-resident by construction (it must be, to broadcast for
        ``assign``), so the write is one createDataFrame of k rows; the
        bucketed data table is the caller's own ``assign`` output — write
        it partitioned by centroid_id so ``search`` prunes partitions."""
        if self.centroids is None:
            raise RuntimeError("fit() first")
        c = np.ascontiguousarray(self.centroids, dtype=np.float32)
        k, d = c.shape
        # Arrow list array straight from the flat float32 buffer — at the
        # auto-sqrt(n) point (k=10^6, d=768) per-row Python tuples would
        # be ~15-20 GB of boxed floats pickled row-by-row (review finding)
        values = pa.array(c.reshape(-1), type=pa.float32())
        offsets = pa.array(
            np.arange(0, (k + 1) * d, d, dtype=np.int32), type=pa.int32()
        )
        tbl = pa.table(
            {
                "cid": pa.array(np.arange(k, dtype=np.int32), type=pa.int32()),
                "vector": pa.ListArray.from_arrays(offsets, values),
            }
        )
        spark.createDataFrame(tbl).write.mode(mode).parquet(f"{path}/centroids")
        spark.createDataFrame(
            [(len(c), int(c.shape[1]), self.nprobe, self.iters, self.seed)],
            "n_centroids int, d int, nprobe int, iters int, seed int",
        ).write.mode(mode).parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "IVFIndex":
        """Reopen a saved index; ``assign``/``search`` work immediately
        (the broadcast is rebuilt lazily on first assign)."""
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        idx = cls(
            n_centroids=int(meta["n_centroids"]),
            nprobe=int(meta["nprobe"]),
            iters=int(meta["iters"]),
            seed=int(meta["seed"]),
        )
        tbl = spark.read.parquet(f"{path}/centroids").orderBy("cid").toArrow()
        c = _list_col_to_matrix(tbl.column("vector"), np.float64)
        if c.shape != (int(meta["n_centroids"]), int(meta["d"])):
            raise ValueError(
                f"centroid table shape {c.shape} does not match meta "
                f"({meta['n_centroids']}, {meta['d']})"
            )
        idx.centroids = c
        return idx

    def probe_ids(self, query: np.ndarray, probes: int | None = None) -> list[int]:
        """The ``probes`` (default nprobe) nearest centroid ids for one
        query — the driver-side bucket ranking that every search variant
        (exact ``search``, ``pq.ivfadc_search``) filters on. Ranked at
        float32 — the precision the centroids persist at (save/load) and
        assign() broadcasts at, so a freshly-fitted and a reloaded index
        pick the SAME bucket set near ties."""
        if self.centroids is None:
            raise RuntimeError("fit() first")
        q = np.asarray(query, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        c32 = np.ascontiguousarray(self.centroids, dtype=np.float32)
        n = self.nprobe if probes is None else int(probes)
        return np.argsort(-(c32 @ qn.astype(np.float32)))[:n].tolist()

    def search(self, indexed_df, vec_col: str, query: np.ndarray, k: int = 10,
               centroid_col: str = "centroid_id"):
        """Top-k within the nprobe nearest centroid buckets. The IN-filter
        on the centroid column prunes before any vector math (and prunes
        partitions when the table is written partitioned by centroid_id)."""
        from pyspark.sql import functions as F

        q = np.asarray(query, dtype=np.float64)
        probe = self.probe_ids(q)
        return (
            indexed_df.filter(F.col(centroid_col).isin(probe))
            .withColumn("cosine", _cosine_expr(vec_col, q))
            .orderBy(F.desc("cosine"))
            .limit(k)
        )
