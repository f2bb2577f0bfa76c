"""Incremental near-dedup: dedup ARRIVING batches against the already-kept
corpus without ever rescanning old documents.

A 10^12-sequence training corpus is ingested in batches (the same
append-only lake model as ``sketches/incremental.IncrementalProfile`` and
``incremental_mphf.IncrementalMPHF``); ``dedup_corpus`` is the right tool
for the one-shot backfill but re-running it per ingest batch rescans (and
re-shingles, re-minhashes, re-bands) the ENTIRE corpus every night — the
one cost profile the incremental family exists to avoid.

``IncrementalDedup`` persists, per committed generation, the LSH state of
the KEPT documents only:

- ``gen=N/bands``: ``(band, band_key, id)`` — the bucket-membership
  relation, ~16 B x bands per kept doc;
- ``gen=N/sigs``:  ``(id, minhash)`` — the MinHash signatures,
  8 x num_hashes B per kept doc.

``append(batch)`` then costs: one signature pass over the NEW batch
(``add_minhash`` / ``add_token_minhash`` — the existing Arrow kernels),
one bucket join of the batch's band rows against the state band relation
(join keyed on ``(band, band_key)``; the state side is scanned but never
re-derived — on a real lake the state table is written bucketed by
``band_key`` so this join co-locates), a within-batch LSH self-join, and
one id-keyed join to fetch matched old signatures. Old documents' TEXT is
never read again; their footprint is the KB-scale state rows.

**Verification is signature-agreement Jaccard**: a candidate pair is a
duplicate iff ``#{i: sig_a[i] == sig_b[i]} >= ceil(threshold *
num_hashes)``. This is the estimator that makes the no-rescan contract
possible (exact shingle Jaccard would need the old text) and it is
computed entirely JVM-side (``zip_with`` + ``aggregate`` Column exprs).
It is an unbiased estimate of true Jaccard with binomial s.e.
``sqrt(t(1-t)/num_hashes)`` (~0.05 at t=0.8, k=64): pairs far from the
threshold — the near-exact copies dedup exists for — are decided
~deterministically; pairs AT the threshold get a coin-flip either way,
exactly the S-curve trade LSH banding already makes. Measured through
the production kernels (BASELINE.md "Verifier calibration", k=64,
cutoff 52): accept probability 0.000 at true j=0.60, 0.033 at 0.70,
0.471 at 0.80, 0.993 at 0.90, 1.000 at 0.95. Batch-vs-batch pairs
use the same estimator so the kept set does not depend on which side of a
generation boundary a duplicate lands.

**Kept-set semantics** (deterministic): within a batch, verified pairs are
clustered by min-label connected components (``dedup.connected_components``).
A new document is dropped iff (a) it is a non-representative member of a
batch cluster, or (b) any member of its cluster (or the document itself,
if unpaired) verifies against an old kept document. Everything else is
kept and its state rows committed as the next generation. Because state
holds only mutually-non-duplicate documents, state band buckets stay
small by construction (hot buckets in a raw corpus are exactly the
duplicate pile-ups dedup removes); ``state_bucket_cap`` guards the
residual pathological bucket by keeping the ``cap`` smallest old ids per
(new doc, band, bucket) — mirroring ``_bucket_candidate_pairs``'s
star-cap trade.

Commit protocol (same discipline as the other incremental structures):
config manifest (mode, num_hashes, bands, shingle, threshold) written at
first append and refused on mismatch — band keys are slices of the
signature, so a banding change poisons every persisted bucket join;
payload dir FIRST, lineage row SECOND (the committed set is DEFINED by
lineage; a crash in between leaves an orphaned ``gen=N`` dir the next
append ignores and overwrites); single-writer ``_lock``;
``stream_batch_id`` folds into the lineage ``run_id`` (``sb<id>:<uuid>``)
so a replayed structured-streaming micro-batch is skipped atomically —
the same marker-inside-the-commit design as
``IncrementalMPHF.append`` (one batch re-appended = its docs dedup
against themselves and vanish, silently corrupting the kept corpus).

Reference analogue: none — minperf has no dedup surface; this implements
the task brief's training-pipeline dedup requirement in the incremental
form a 100 TB ingest actually needs. Batch-mode parity: on a corpus whose
duplicate clusters are signature-clique at the threshold (near-exact
copies — the regime the fixtures and the ``dedup_corpus`` oracle model),
feeding id-ordered batches reproduces ``dedup_corpus``'s kept set exactly
(the earliest batch containing any cluster member contains its min id);
tested, and pinned by the ``incremental_dedup_documents`` driver query.
"""

from __future__ import annotations

import math
import time
import uuid

from ..sketches.incremental import (
    _dir_exists,
    acquire_writer_lock,
    align_tombstone_ids,
    commit_tombstone_generation,
    read_lineage_rows,
    read_tombstone_ids,
    release_writer_lock,
    stream_high_water,
)
from .dedup import (
    _band_rows,
    _banded_pairs,
    add_minhash,
    add_token_minhash,
    connected_components,
    derive_banding,
)

_CFG_SCHEMA = (
    "mode string, num_hashes int, bands int, shingle int, threshold double"
)
_LIN_SCHEMA = (
    "gen int, n_in long, n_kept long, n_matched_old long,"
    " n_clusters long, run_id string, wall_s double"
)


class IncrementalDedup:
    """A persisted, appendable near-dedup state over a growing corpus
    (see module docstring). ``path`` is any Spark-readable directory URI;
    ``mode`` is ``'text'`` (char-shingle MinHash over a string column) or
    ``'tokens'`` (token-shingle MinHash over an ``array<int>`` column —
    the north-rule payload). Ids must be int64 and globally unique across
    appends (the lake's doc_id contract; a re-appended duplicate DOC is
    caught as a near-dup of its kept copy, but two distinct docs sharing
    an id are the caller's bug)."""

    def __init__(
        self,
        path: str,
        threshold: float = 0.8,
        num_hashes: int = 64,
        bands: int | None = None,
        shingle: int = 5,
        mode: str = "text",
        bucket_cap: int = 1000,
        state_bucket_cap: int = 50,
    ) -> None:
        if mode not in ("text", "tokens"):
            raise ValueError("mode must be 'text' or 'tokens'")
        if not (0.0 < threshold < 1.0):
            raise ValueError("threshold must be in (0, 1)")
        if bands is None:
            bands, _r = derive_banding(threshold, num_hashes)
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        self.path = path.rstrip("/")
        self.threshold = float(threshold)
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle = shingle
        self.mode = mode
        self.bucket_cap = bucket_cap
        self.state_bucket_cap = state_bucket_cap
        # integer agreement cutoff: est_jaccard >= threshold without floats
        self._match_min = math.ceil(self.threshold * num_hashes - 1e-9)

    @classmethod
    def open(cls, spark, path: str, bucket_cap: int = 1000,
             state_bucket_cap: int = 50) -> "IncrementalDedup":
        """Open an existing store under its PINNED config — no kwargs to
        repeat (and no way to mis-repeat them: the banding config is a
        serialization contract, so handles for maintenance operations
        like ``delete``/``consolidate`` should adopt it, not restate
        it). The two caps are runtime knobs, not wire format."""
        path = path.rstrip("/")
        if not _dir_exists(spark, f"{path}/manifest"):
            raise RuntimeError(
                f"no incremental dedup committed at {path}"
            )
        r = spark.read.parquet(f"{path}/manifest").collect()[0]
        return cls(
            path,
            threshold=float(r["threshold"]),
            num_hashes=int(r["num_hashes"]),
            bands=int(r["bands"]),
            shingle=int(r["shingle"]),
            mode=r["mode"],
            bucket_cap=bucket_cap,
            state_bucket_cap=state_bucket_cap,
        )

    # -- manifest / lock (same pattern as the other incremental structures) ----
    def _config_row(self) -> tuple:
        return (
            self.mode, self.num_hashes, self.bands, self.shingle,
            self.threshold,
        )

    def _check_or_write_manifest(self, spark) -> None:
        if not _dir_exists(spark, f"{self.path}/manifest"):
            if _dir_exists(spark, f"{self.path}/lineage"):
                raise RuntimeError(
                    f"incremental dedup at {self.path} has committed "
                    "generations but no readable manifest; re-run against "
                    "a fresh path or restore the manifest"
                )
            spark.createDataFrame(
                [self._config_row()], _CFG_SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{self.path}/manifest"
            )
            return
        r = spark.read.parquet(f"{self.path}/manifest").collect()[0]
        pinned = (
            r["mode"], r["num_hashes"], r["bands"], r["shingle"],
            r["threshold"],
        )
        if pinned != self._config_row():
            raise RuntimeError(
                "incremental dedup manifest mismatch: committed config "
                f"{pinned} != requested {self._config_row()}; band keys "
                "are signature slices, so appending under a different "
                "config would poison every persisted bucket join"
            )

    def _acquire_lock(self, spark) -> None:
        acquire_writer_lock(spark, self.path, "incremental dedup")

    def _release_lock(self, spark) -> None:
        release_writer_lock(spark, self.path)

    def break_lock(self, spark) -> None:
        """Remove a stale writer lock left by a crashed append. Only safe
        when no other writer is actually running."""
        self._release_lock(spark)

    # -- committed state --------------------------------------------------------
    def _lineage_rows(self, spark) -> list:
        return read_lineage_rows(spark, self.path)

    def generations(self, spark) -> list[dict]:
        """Committed generations, oldest first: [{gen, n_in, n_kept,
        n_matched_old, n_clusters, run_id}]."""
        return [
            {
                "gen": int(r["gen"]),
                "n_in": int(r["n_in"]),
                "n_kept": int(r["n_kept"]),
                "n_matched_old": int(r["n_matched_old"]),
                "n_clusters": int(r["n_clusters"]),
                "run_id": r["run_id"],
            }
            for r in self._lineage_rows(spark)
        ]

    def total_kept(self, spark) -> int:
        return sum(int(r["n_kept"]) for r in self._lineage_rows(spark))

    def last_stream_batch_id(self, spark) -> int:
        """Highest committed ``stream_batch_id`` (folded into lineage
        ``run_id`` as ``sb<id>:<uuid>``); -1 if none."""
        return stream_high_water(self._lineage_rows(spark))

    def kept_ids(self, spark, gen: int | None = None):
        """DataFrame[id long] of kept documents — one generation (``gen``)
        or the whole committed corpus, EXCLUDING tombstoned ids (a
        deleted doc disappears from recomputed outputs too, including
        streaming replay rewrites — the intended right-to-be-forgotten
        semantic). Reads only the KB-scale sig tables, never the
        corpus."""
        st = self._state(spark, "sigs", gen)
        if st is None:
            return spark.createDataFrame([], "id long")
        return st.select("id")

    def _committed_paths(self, spark, sub: str, gen: int | None = None):
        rows = self._lineage_rows(spark)
        if gen is not None:
            rows = [r for r in rows if int(r["gen"]) == gen]
            if not rows:
                raise ValueError(f"generation {gen} is not committed")
        return [
            f"{self.path}/gen={int(r['gen'])}/{sub}"
            for r in rows
            if int(r["n_kept"]) > 0
        ]

    def _state(self, spark, sub: str, gen: int | None = None):
        """Committed state relation (``sigs`` or ``bands``) with the
        tombstone set anti-joined out, or None if nothing is committed.
        Every state read goes through here so a ``delete`` is effective
        everywhere at once (appends stop matching the deleted doc,
        consolidation drops it physically)."""
        from pyspark.sql import functions as F

        paths = self._committed_paths(spark, sub, gen)
        if not paths:
            return None
        df = spark.read.parquet(*paths)
        tomb = self._tombstones(spark)
        if tomb is None:
            return df
        return df.join(F.broadcast(tomb), "id", "left_anti")

    # -- deletion (tombstones; shared machinery in sketches/incremental) --------
    def _tombstones(self, spark):
        return read_tombstone_ids(spark, self.path, "id")

    def total_tombstoned(self, spark) -> int:
        t = self._tombstones(spark)
        return 0 if t is None else t.count()

    def delete(self, spark, ids) -> dict:
        """Tombstone kept ids (right-to-be-forgotten for the dedup
        state): the deleted doc's band/signature rows stop matching
        immediately — a FUTURE near-copy of it will be KEPT, which is
        exactly what forgetting means — and ``consolidate`` drops the
        rows physically. ``ids`` is an int64 list or a DataFrame whose
        first selected column is the id. Re-deletes and unknown ids are
        set-semantics no-ops; same payload-then-lineage crash discipline
        as appends."""
        import time as _time

        t0 = _time.time()
        if not _dir_exists(spark, f"{self.path}/manifest"):
            # a mistyped path must refuse loudly, NOT create a manifest
            # pinning this handle's config and report a no-op "success"
            # while the real store keeps matching the docs
            raise RuntimeError(
                f"no incremental dedup committed at {self.path}; "
                "nothing to forget (open() the real store)"
            )
        self._acquire_lock(spark)
        try:
            self._check_or_write_manifest(spark)
            if isinstance(ids, (list, tuple)):
                ids_df = spark.createDataFrame(
                    [(i,) for i in ids], "id string"
                ) if ids and isinstance(ids[0], str) else spark.createDataFrame(
                    [(int(i),) for i in ids], "id long"
                )
            else:
                ids_df = ids.select(ids.columns[0]).toDF("id")
            # nothing committed yet -> nothing to forget, no-op
            paths = self._committed_paths(spark, "sigs")
            if not paths:
                return {"gen": None, "n": 0,
                        "wall_s": _time.time() - t0}
            id_type = spark.read.parquet(paths[0]).schema["id"].dataType
            ids_df = align_tombstone_ids(ids_df, "id", id_type)
            return commit_tombstone_generation(spark, self.path, ids_df, t0)
        finally:
            self._release_lock(spark)

    # -- signatures / verification ----------------------------------------------
    def _signatures(self, df, id_col: str, content_col: str):
        if self.mode == "tokens":
            return add_token_minhash(
                df, id_col, content_col, self.num_hashes, self.shingle
            )
        return add_minhash(df, id_col, content_col, self.num_hashes, self.shingle)

    def _verified(self, pairs, sig_a, sig_b):
        """Filter candidate (id_a, id_b) pairs by signature agreement
        >= ceil(threshold * num_hashes) — all Column exprs, no Python."""
        from pyspark.sql import functions as F

        a = sig_a.select(
            F.col("id").alias("id_a"), F.col("minhash").alias("__mh_a")
        )
        b = sig_b.select(
            F.col("id").alias("id_b"), F.col("minhash").alias("__mh_b")
        )
        agree = F.aggregate(
            F.zip_with(
                F.col("__mh_a"),
                F.col("__mh_b"),
                lambda x, y: (x == y).cast("int"),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        return (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .filter(agree >= F.lit(self._match_min))
            .select("id_a", "id_b")
        )

    # -- append -------------------------------------------------------------------
    def append(self, df, id_col: str, content_col: str,
               stream_batch_id: int | None = None):
        """Dedup one new batch against the kept corpus + itself and commit
        the survivors' LSH state as the next generation.

        Returns ``(kept_df, metrics)``: ``kept_df`` is the input rows that
        survived (all columns — join back of the committed kept-id set, so
        it is exactly reproducible from state later via ``kept_ids``), and
        ``metrics`` is the lineage row as a dict. With ``stream_batch_id``
        the commit is idempotent under foreachBatch replay: a replayed id
        returns ``(kept-for-that-generation, {skipped_replay: True, ...})``
        recomputed FROM STATE, so a crashed downstream write can always be
        redone."""
        t0 = time.time()
        spark = df.sparkSession
        # lock BEFORE the manifest check (see acquire_writer_lock)
        self._acquire_lock(spark)
        try:
            self._check_or_write_manifest(spark)
            return self._append_locked(
                df, id_col, content_col, t0, stream_batch_id
            )
        finally:
            self._release_lock(spark)

    def _append_locked(self, df, id_col, content_col, t0, stream_batch_id):
        from pyspark.sql import functions as F

        spark = df.sparkSession
        if stream_batch_id is not None:
            prev = self._replayed_gen(spark, stream_batch_id)
            if prev is not None:
                gen, row = prev
                live_ids = self.kept_ids(spark, gen)
                kept = df.join(
                    live_ids.withColumnRenamed("id", id_col),
                    id_col,
                    "left_semi",
                )
                m = {
                    "gen": gen,
                    "n_in": int(row["n_in"]),
                    # LIVE count, not the lineage's historical n_kept:
                    # a delete between the original run and the replay
                    # shrinks the rewritten slot on purpose, and the
                    # metrics must agree with the rows (reconciliation
                    # jobs compare them)
                    "n_kept": int(live_ids.count()),
                    "n_matched_old": int(row["n_matched_old"]),
                    "n_clusters": int(row["n_clusters"]),
                    "wall_s": time.time() - t0,
                    "skipped_replay": True,
                }
                return kept, m

        lineage = self._lineage_rows(spark)
        gen = int(lineage[-1]["gen"]) + 1 if lineage else 0

        sig = self._signatures(df, id_col, content_col).withColumnRenamed(
            id_col, "id"
        ).persist()
        # one action materializes the persist AND yields both counts
        # (signature rows are 1:1 with input rows)
        cnt = sig.agg(
            F.count("*").alias("n"), F.countDistinct("id").alias("d")
        ).collect()[0]
        n_in, n_distinct = int(cnt["n"]), int(cnt["d"])
        if n_in == 0:
            sig.unpersist()
            return df, {
                "gen": None, "n_in": 0, "n_kept": 0, "n_matched_old": 0,
                "n_clusters": 0, "wall_s": time.time() - t0,
                "skipped_replay": False,
            }
        if n_distinct != n_in:
            sig.unpersist()
            raise ValueError(
                f"batch ids must be distinct within the batch "
                f"({n_in} rows, {n_distinct} distinct ids)"
            )

        # -- new-vs-old: batch band rows join the persisted bucket relation
        # id-type discipline: empty relations below take the BATCH id
        # type (a hardcoded long made string ids die in an implicit
        # string->bigint join cast, round-5 finding), and a batch whose
        # id type disagrees with the persisted state refuses loudly —
        # mixed-type gen dirs would fail parquet schema merge later,
        # far from the cause (refuse-don't-adapt, manifest discipline).
        id_t = sig.schema["id"].dataType.simpleString()
        committed = self._committed_paths(spark, "sigs")
        if committed:
            state_t = (
                spark.read.parquet(committed[0]).schema["id"]
                .dataType.simpleString()
            )
            if state_t != id_t:
                sig.unpersist()
                raise ValueError(
                    f"batch id column {id_col!r} has type {id_t} but the "
                    f"committed state at {self.path} holds {state_t} ids; "
                    "appends must keep one id type per store"
                )
        old_bands = self._state(spark, "bands")
        if old_bands is not None:
            batch_bands = _band_rows(sig, "id", self.num_hashes, self.bands)
            cand_old = (
                batch_bands.withColumnRenamed("id", "id_a")
                .join(
                    old_bands.withColumnRenamed("id", "id_b"),
                    ["band", "band_key"],
                )
                .select("id_a", "id_b", "band", "band_key")
            )
            # residual hot-bucket guard: keep the cap smallest old ids per
            # (new doc, band bucket) — state buckets are small by
            # construction (kept docs are mutually non-duplicate), so this
            # only fires on pathological sub-threshold pile-ups.
            from pyspark.sql.window import Window

            w = Window.partitionBy("id_a", "band", "band_key").orderBy("id_b")
            cand_old = (
                cand_old.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= self.state_bucket_cap)
                .select("id_a", "id_b")
                .distinct()
            )
            old_sigs = self._state(spark, "sigs")
            matched_old = (
                self._verified(cand_old, sig, old_sigs)
                .select("id_a")
                .distinct()
                .persist()
            )
        else:
            matched_old = spark.createDataFrame([], f"id_a {id_t}").persist()
        n_matched_old = matched_old.count()

        # -- new-vs-new: within-batch LSH + same verification
        cand_new = _banded_pairs(
            sig, "id", self.num_hashes, self.bands, self.bucket_cap
        )
        verified_new = self._verified(cand_new, sig, sig).persist()
        if verified_new.count() == 0:
            # clean-corpus common case: skip the CC driver loop entirely
            clusters = spark.createDataFrame(
                [], f"id {id_t}, rep {id_t}"
            ).persist()
            n_clusters = 0
        else:
            clusters = connected_components(verified_new).persist()
            n_clusters = int(
                clusters.agg(F.countDistinct("rep")).collect()[0][0]
            )
        verified_new.unpersist()

        # -- resolution: a cluster touching the old corpus drops whole;
        # otherwise its min-id rep survives; unpaired docs drop iff matched
        hit_reps = (
            clusters.join(
                matched_old.withColumnRenamed("id_a", "id"), "id", "left_semi"
            )
            .select("rep")
            .distinct()
        )
        drop = (
            clusters.join(hit_reps, "rep", "left_semi").select("id")
            .unionByName(
                clusters.filter(F.col("id") != F.col("rep")).select("id")
            )
            .unionByName(matched_old.withColumnRenamed("id_a", "id"))
            .distinct()
        )
        kept_sigs = sig.join(drop, "id", "left_anti").persist()
        n_kept = kept_sigs.count()

        # -- commit: payload dir first, lineage second (committed set is
        # DEFINED by lineage; orphan dirs are overwritten on retry)
        gdir = f"{self.path}/gen={gen}"
        kept_sigs.write.mode("overwrite").parquet(f"{gdir}/sigs")
        _band_rows(kept_sigs, "id", self.num_hashes, self.bands).select(
            "band", "band_key", "id"
        ).write.mode("overwrite").parquet(f"{gdir}/bands")
        run_id = uuid.uuid4().hex
        if stream_batch_id is not None:
            run_id = f"sb{int(stream_batch_id)}:{run_id}"
        wall = time.time() - t0
        spark.createDataFrame(
            [(gen, n_in, n_kept, n_matched_old, n_clusters, run_id, wall)],
            _LIN_SCHEMA,
        ).write.mode("append").parquet(f"{self.path}/lineage")

        # join back against the COMMITTED sig table (not the in-memory
        # lineage): the returned relation re-reads KB-scale parquet instead
        # of recomputing the dedup pipeline once the persists are released
        kept = df.join(
            self.kept_ids(spark, gen).withColumnRenamed("id", id_col),
            id_col,
            "left_semi",
        )
        sig.unpersist()
        matched_old.unpersist()
        clusters.unpersist()
        kept_sigs.unpersist()
        return kept, {
            "gen": gen,
            "n_in": int(n_in),
            "n_kept": int(n_kept),
            "n_matched_old": int(n_matched_old),
            "n_clusters": int(n_clusters),
            "wall_s": wall,
            "skipped_replay": False,
        }

    # -- consolidation ------------------------------------------------------------
    def consolidate(self, spark, new_path: str) -> "IncrementalDedup":
        """Planned rewrite of the accumulated per-generation state dirs
        into ONE generation at ``new_path`` (returns the new handle) —
        the small-files compaction a nightly cadence needs (365 appends =
        365 sig + 365 band dirs; every append unions them all). One
        distributed read+write of the KB-scale state tables, no corpus
        scan and no re-verification: the kept set is already mutually
        non-duplicate, so consolidation is pure relocation. The stream
        replay high-water mark is carried forward in the single lineage
        row's ``run_id`` so a later ``StreamingDedupIngest`` resume
        against the consolidated path still skips replayed batches.
        The old path is left untouched (same contract as
        ``IncrementalMPHF.compact``: consumers repoint when ready)."""
        self._check_or_write_manifest(spark)
        rows = self._lineage_rows(spark)
        if not rows:
            raise RuntimeError(f"nothing committed at {self.path}")
        new_path = new_path.rstrip("/")
        if _dir_exists(spark, f"{new_path}/lineage"):
            raise RuntimeError(
                f"consolidate target {new_path} already has committed "
                "generations; use a fresh path"
            )
        new = IncrementalDedup(
            new_path,
            threshold=self.threshold,
            num_hashes=self.num_hashes,
            bands=self.bands,
            shingle=self.shingle,
            mode=self.mode,
            bucket_cap=self.bucket_cap,
            state_bucket_cap=self.state_bucket_cap,
        )
        new._check_or_write_manifest(spark)
        t0 = time.time()
        # reads go through _state: consolidation is where tombstoned
        # rows are physically dropped (the new store starts clean)
        sigs = self._state(spark, "sigs")
        sigs.write.mode("overwrite").parquet(f"{new_path}/gen=0/sigs")
        self._state(spark, "bands").write.mode(
            "overwrite"
        ).parquet(f"{new_path}/gen=0/bands")
        n_kept = spark.read.parquet(f"{new_path}/gen=0/sigs").count()
        n_in = sum(int(r["n_in"]) for r in rows)
        hw = self.last_stream_batch_id(spark)
        run_id = uuid.uuid4().hex
        if hw >= 0:
            run_id = f"sb{hw}:{run_id}"
        spark.createDataFrame(
            [(0, n_in, n_kept, 0, 0, run_id, time.time() - t0)],
            _LIN_SCHEMA,
        ).write.mode("append").parquet(f"{new_path}/lineage")
        return new

    def _replayed_gen(self, spark, stream_batch_id: int):
        """(gen, lineage_row) of the generation a replayed micro-batch
        already committed as, else None — EXACT ``sb<id>:`` marker match
        only. An id at or below the high-water mark with no marker can
        only be a batch whose original run committed nothing (empty
        batches commit no lineage row); re-appending it is a natural
        no-op, whereas a high-water-mark fallback would return ANOTHER
        batch's metrics and make the streaming wrapper write a spurious
        output slot."""
        for r in self._lineage_rows(spark):
            rid = r["run_id"] or ""
            if rid.startswith(f"sb{int(stream_batch_id)}:"):
                return int(r["gen"]), r
        return None
