"""Structured Streaming integration for the mergeable sketches.

The reference has no streaming (an MPHF needs a closed key set,
``simple/recsplit.md:51-54``), but every sketch here is a commutative
monoid, so incremental maintenance over a stream is exactly a
``foreachBatch`` fold: per micro-batch run the same two-phase partial
aggregation as the batch path, then merge into the running state. Because
merges are order-independent, the streaming state after any prefix of the
data is byte-identical to a batch build over the same rows — that is the
test oracle.

Replay safety: Structured Streaming may re-deliver a micro-batch after a
failure. The aggregator persists ``(last_batch_id, state)`` atomically per
batch; re-delivered batch ids ≤ last are skipped, making the fold
idempotent (exactly-once effect on the state). Sketch updates are NOT
invertible, so skipping — not re-merging — is the correct recovery.
"""

from __future__ import annotations

import json
import os
import struct

import pandas as pd

from .sketches.base import MergeableSketch


def _feed(series, ngram: int | None):
    """The per-micro-batch feed — literally the batch kernel
    (``sketches.base.feed_series``), so stream-vs-batch byte-identity
    holds by construction, not by parallel maintenance. With a window
    feed, ``n_total`` counts windows, not rows."""
    from .sketches.base import feed_series

    return feed_series(series, ngram)


def _fold_into_state(sketch: MergeableSketch, ngram: int | None,
                     state, pdf_iter):
    """Shared stateful-operator body: load (or init) the serialized
    sketch from the group state, fold every arriving batch through the
    batch feed, write the state back. Returns ``(sketch_state, n)``."""
    if state.exists:
        blob, n = state.get
        st = sketch.from_bytes(bytes(blob))
    else:
        st, n = sketch.new_state(), 0
    for pdf in pdf_iter:
        arr = _feed(pdf["__in"], ngram)
        sketch.update(st, arr)
        n += len(arr)
    state.update((sketch.to_bytes(st), n))
    return st, n


class _ForeachBatchSink:
    """Shared writeStream plumbing for every foreachBatch-based sink in
    this module: subclasses define ``foreach_batch(batch_df, batch_id)``.

    ``start`` attaches to a streaming DataFrame and starts the query.
    Default trigger is ``availableNow=True`` (drain what exists, then
    stop) — override with e.g. ``processingTime="10 seconds"``.
    """

    def start(self, stream_df, checkpoint_dir: str | None = None, **trigger):
        if not trigger:
            trigger = {"availableNow": True}
        w = (
            stream_df.writeStream.foreachBatch(self.foreach_batch)
            .trigger(**trigger)
        )
        if checkpoint_dir:
            w = w.option("checkpointLocation", checkpoint_dir)
        return w.start()


class StreamingMPHFIngest(_ForeachBatchSink):
    """Structured-streaming ingest into an ``IncrementalMPHF``: each
    micro-batch of NEW keys commits as the next generation, so stable
    ``[0, n)`` ids are assigned as data arrives.

    The reference cannot do this at all — its MPHF needs a closed key
    set (``simple/recsplit.md:51-54``; ``RecSplitBuilder.generate`` is
    one-shot) — and unlike the sketches there is no monoid to lean on:
    a generation commit assigns ids, so a replayed micro-batch must be
    SKIPPED, never re-appended (one key, two ids). Replay safety
    therefore rides the structure's own lineage, not a sidecar file:
    ``append(stream_batch_id=...)`` folds the batch id into the lineage
    ``run_id``, making the replay marker atomic with the generation
    commit. That holds even if the streaming checkpoint itself is lost
    and the source replays from batch 0 (tested) — strictly stronger
    than ``StreamingSketch``'s ``(last_batch_id, state)`` sidecar.

    Usage::

        ingest = StreamingMPHFIngest(IncrementalMPHF(path), "doc_id")
        q = ingest.start(stream_df, checkpoint_dir="/ckpt/ids")
        q.awaitTermination()
        ingest.inc.route(df, "doc_id")   # ids for everything ingested

    Batches must contain only never-seen keys (the lake-append contract
    ``IncrementalMPHF.append`` documents; its duplicate-storm guard
    fires otherwise). Empty micro-batches are no-ops.
    """

    def __init__(self, inc, key_col: str,
                 duplicate_guard: float | None = 8.0) -> None:
        self.inc = inc
        self.key_col = key_col
        self.duplicate_guard = duplicate_guard
        self.metrics: list[dict] = []

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        m = self.inc.append(
            batch_df,
            self.key_col,
            duplicate_guard=self.duplicate_guard,
            stream_batch_id=batch_id,
        )
        self.metrics.append(m)



class StreamingDedupIngest(_ForeachBatchSink):
    """Structured-streaming near-dedup: each micro-batch is deduped
    against the persisted kept-corpus LSH state (plus itself) by
    ``IncrementalDedup.append`` and the SURVIVORS are written to
    ``out_dir/batch=<id>/`` — the deduplicated training corpus, built as
    data arrives, with old documents never rescanned.

    Exactly-once output without a transactional sink: the dedup state is
    the source of truth (the batch-id marker commits inside its lineage,
    same design as ``StreamingMPHFIngest``), and the kept output is a
    deterministic FUNCTION of (batch rows, committed generation) written
    with ``mode="overwrite"`` into a per-batch subdirectory. Any replay —
    including after the kept-write crashed, or after the streaming
    checkpoint itself is lost — recomputes the same kept set from state
    and overwrites the same path (tested). Readers take the whole
    ``out_dir`` as one parquet corpus.

    Usage::

        ingest = StreamingDedupIngest(
            IncrementalDedup(state_path), "doc_id", "text", "/lake/clean"
        )
        q = ingest.start(stream_df, checkpoint_dir="/ckpt/dedup")
        q.awaitTermination()
        clean = spark.read.parquet("/lake/clean")   # deduped corpus
    """

    def __init__(self, inc, id_col: str, content_col: str,
                 out_dir: str | None = None) -> None:
        self.inc = inc
        self.id_col = id_col
        self.content_col = content_col
        self.out_dir = out_dir.rstrip("/") if out_dir else None
        self.metrics: list[dict] = []

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        kept, m = self.inc.append(
            batch_df, self.id_col, self.content_col,
            stream_batch_id=batch_id,
        )
        if self.out_dir is not None and m["gen"] is not None:
            kept.write.mode("overwrite").parquet(
                f"{self.out_dir}/batch={int(batch_id)}"
            )
        self.metrics.append(m)



class StreamingANNIngest(_ForeachBatchSink):
    """Structured-streaming ingest into an ``IncrementalANN`` store: each
    micro-batch is assigned to the pinned centroids and committed as the
    next generation (one broadcast assign pass + a centroid-partitioned
    write; old vectors never touched). Replay safety rides the store's
    lineage marker (``append(stream_batch_id=...)``), so a replayed
    micro-batch — even after the streaming checkpoint is lost — commits
    nothing twice; because generation payloads are idempotent overwrites
    keyed by gen, the store is exactly-once by construction.

    Usage::

        ingest = StreamingANNIngest(IncrementalANN(path, index=idx),
                                    "vec_id", "embedding")
        q = ingest.start(stream_df, checkpoint_dir="/ckpt/ann")
        q.awaitTermination()
        ingest.store.search(spark, query_vec, k=10)
    """

    def __init__(self, store, id_col: str, vec_col: str) -> None:
        self.store = store
        self.id_col = id_col
        self.vec_col = vec_col
        self.metrics: list[dict] = []

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        m = self.store.append(
            batch_df, self.id_col, self.vec_col, stream_batch_id=batch_id
        )
        self.metrics.append(m)



class StreamingSketch(_ForeachBatchSink):
    """Incrementally folds a stream into one sketch state via foreachBatch.

    Usage::

        agg = StreamingSketch(HyperLogLog(p=14), "doc_id",
                              state_path="/ckpt/hll_state")
        q = agg.start(stream_df, checkpoint_dir="/ckpt/hll")
        q.awaitTermination()
        agg.estimate()

    The ``(last_batch_id, state)`` sidecar's replay guard is only sound
    against batch ids from ONE stable checkpoint lineage, so
    ``state_path`` REQUIRES ``checkpoint_dir`` on ``start`` and the
    sidecar pins the checkpoint it was built under (a resume under a
    different checkpoint renumbers batches from 0 — the guard would
    silently skip all new data). Callers driving ``foreach_batch``
    from their own sink own that contract themselves.
    """

    def __init__(
        self,
        sketch: MergeableSketch,
        col: str,
        state_path: str | None = None,
        ngram: int | None = None,
    ) -> None:
        sketch._check_ngram(ngram)
        self.sketch = sketch
        self.col = col
        self.ngram = ngram
        self.state_path = state_path
        self.state = sketch.new_state()
        self.last_batch_id = -1
        self._checkpoint: str | None = None
        self._bound_checkpoint: str | None = None
        if state_path and os.path.exists(state_path):
            self._load()

    def start(self, stream_df, checkpoint_dir: str | None = None, **trigger):
        if self.state_path and not checkpoint_dir:
            raise ValueError(
                "StreamingSketch(state_path=...) requires checkpoint_dir "
                "on start(): without a stable checkpoint, a re-run "
                "renumbers micro-batches from 0 and the sidecar's replay "
                "guard silently skips every new batch"
            )
        if checkpoint_dir:
            cp = checkpoint_dir.rstrip("/")
            if self._bound_checkpoint and self._bound_checkpoint != cp:
                raise ValueError(
                    f"state at {self.state_path} was built under "
                    f"checkpoint {self._bound_checkpoint!r}; resuming "
                    f"under {cp!r} would replay unrelated batch ids — "
                    "keep the checkpoint or start a fresh state_path"
                )
            self._checkpoint = cp
        return super().start(stream_df, checkpoint_dir, **trigger)

    # -- persistence ---------------------------------------------------------
    def _load(self) -> None:
        with open(self.state_path, "rb") as f:
            raw = f.read()
        (hlen,) = struct.unpack_from("<I", raw, 0)
        meta = json.loads(raw[4 : 4 + hlen])
        self.last_batch_id = meta["last_batch_id"]
        self._bound_checkpoint = meta.get("checkpoint")
        self.state = self.sketch.from_bytes(raw[4 + hlen :])

    def _save(self) -> None:
        meta = json.dumps(
            {
                "last_batch_id": self.last_batch_id,
                "checkpoint": self._checkpoint or self._bound_checkpoint,
            }
        ).encode()
        tmp = f"{self.state_path}.tmp"
        with open(tmp, "wb") as f:
            f.write(struct.pack("<I", len(meta)) + meta + self.sketch.to_bytes(self.state))
        os.replace(tmp, self.state_path)  # atomic: readers see old or new

    # -- the sink ------------------------------------------------------------
    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if batch_id <= self.last_batch_id:
            return  # replayed micro-batch: already folded
        part = self.sketch.build(batch_df, self.col, ngram=self.ngram)
        self.state = self.sketch.merge(self.state, part)
        self.last_batch_id = batch_id
        if self.state_path:
            self._save()


    def estimate(self) -> float:
        return self.sketch.estimate(self.state)


def windowed_sketch(
    stream_df,
    sketch: MergeableSketch,
    col: str,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    ngram: int | None = None,
):
    """Event-time windowed sketch aggregation with late-data handling — the
    Structured Streaming 'watermark + windowed agg' shape with a custom
    stateful operator (``applyInPandasWithState`` keyed by window).

    Each trigger emits ``(window_start, estimate, n_total, final)`` for
    every window updated in that micro-batch; when the watermark passes a
    window's end its state times out (EventTimeTimeout), a last row with
    ``final=true`` is emitted, and the state is evicted — so state size is
    bounded by the number of OPEN windows, not stream length. Rows later
    than ``watermark`` are dropped by the engine before reaching the
    operator (standard late-data semantics).

    ``ngram=n`` feeds the sketch every n-token window hash of ``col``
    (an ``array<int>`` token column) instead of the scalar value — the
    same in-kernel feed as the batch ``ngram`` entry points, so e.g. a
    per-window distinct-trigram HLL over a live token stream needs no
    row explosion.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sketch._check_ngram(ngram)
    # applyInPandasWithState hands group keys to the worker as tz-NAIVE
    # pandas Timestamps in the SESSION timezone, and a naive
    # Timestamp.timestamp() assumes UTC — in any non-UTC session the
    # timeout would be shifted by the tz offset (west of UTC it lands
    # BEFORE the watermark and the query dies with
    # INVALID_TIMEOUT_TIMESTAMP; east of it windows finalize hours
    # late). Capture the session tz once and localize in the worker.
    session_tz = stream_df.sparkSession.conf.get(
        "spark.sql.session.timeZone"
    )
    in_expr = (
        sketch._input_expr(col)
        if ngram is None
        else F.col(col).alias("__in")
    )
    src = (
        stream_df.select(F.window(F.col(ts_col), window).alias("__w"), in_expr)
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("__w_end"),
            "__in",
        )
        # the event-time tag does not survive the projection, so re-anchor
        # the watermark on the window END (standard chained-agg idiom): a
        # row is late when its whole window is behind the watermark
        .withWatermark("__w_end", watermark)
    )
    out_schema = "window_start timestamp, estimate double, n_total long, final boolean"
    state_schema = "blob binary, n long"

    def _update(key, pdf_iter, state: "GroupState"):
        win_start, win_end = key
        if state.hasTimedOut:  # watermark passed window end: finalize
            blob, n = state.get
            st = sketch.from_bytes(bytes(blob))
            state.remove()
            yield pd.DataFrame(
                {
                    "window_start": [win_start],
                    "estimate": [float(sketch.estimate(st))],
                    "n_total": [n],
                    "final": [True],
                }
            )
            return
        st, n = _fold_into_state(sketch, ngram, state, pdf_iter)
        end = (
            # ambiguous=False: a window end inside the DST fall-back
            # repeated hour maps to the LATER (standard-time) instant, so
            # the timeout can fire late by an hour once a year but never
            # EARLY (early would finalize at/before the watermark while
            # in-window rows can still arrive)
            win_end.tz_localize(
                session_tz, ambiguous=False, nonexistent="shift_forward"
            )
            if win_end.tzinfo is None
            else win_end
        )
        state.setTimeoutTimestamp(int(end.timestamp() * 1000))
        yield pd.DataFrame(
            {
                "window_start": [win_start],
                "estimate": [float(sketch.estimate(st))],
                "n_total": [n],
                "final": [False],
            }
        )

    return src.groupBy("window_start", "__w_end").applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )


def stateful_sketch_by_key(stream_df, sketch: MergeableSketch, col: str,
                           key_col: str, ngram: int | None = None):
    """Per-key incremental sketch over a stream — a custom stateful operator
    on ``applyInPandasWithState`` (per-group state = the serialized sketch).

    Each trigger emits one row per updated key:
    ``(key, estimate double, n_total long)``. Because the sketch is a
    monoid and the state store is exactly-once, the per-key state after any
    prefix of the stream equals a batch build over the same rows — the test
    oracle. Use for e.g. live per-source distinct-doc_id tracking while a
    crawl ingests; with ``ngram=n`` the feed is every n-token window hash
    of ``col`` (live per-source distinct-n-gram tracking, no row
    explosion).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sketch._check_ngram(ngram)
    if key_col in ("estimate", "n_total"):
        raise ValueError(
            f"key_col {key_col!r} collides with a fixed output column "
            "(estimate, n_total); alias the key first"
        )
    # backticks: the user's column name goes into a DDL string, and
    # names with spaces/hyphens are legal parquet columns
    out_schema = f"`{key_col}` string, estimate double, n_total long"
    state_schema = "blob binary, n long"

    def _update(key, pdf_iter, state: "GroupState"):
        st, n = _fold_into_state(sketch, ngram, state, pdf_iter)
        yield pd.DataFrame(
            {
                # PYTHON-str key form — the per-key state-table contract
                # (multi._stage1_by_key uses str(kt[j]); Spark CAST
                # disagrees for bool/float/NULL keys, see CLAUDE.md) —
                # so streaming per-key rows join/compare cleanly against
                # every batch per-key surface
                key_col: [str(key[0])],
                "estimate": [float(sketch.estimate(st))],
                "n_total": [n],
            }
        )

    in_expr = (
        sketch._input_expr(col)
        if ngram is None
        else stream_df[col].alias("__in")
    )
    # group on the RAW key value (indexed access, not F.col — dotted or
    # spaced names resolve literally); stringification happens kernel-
    # side with str() to match the batch key forms
    src = stream_df.select(in_expr, stream_df[key_col].alias("__key"))
    return src.groupBy("__key").applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
