"""Mergeable sketch UDAFs over Spark — common partial-aggregation plumbing.

PySpark has no native UDAF extension point, so every sketch follows the
classic two-phase pattern (SURVEY §2.7 "aggregations"):

  stage 1 (map-side combine): one ``mapInPandas`` pass folds each partition
      (optionally per group key) into a serialized sketch state — one output
      row per (partition x key);
  stage 2 (final): ``groupBy(keys).applyInPandas`` (or a driver-side reduce
      for the global case) merges states. Merges are commutative +
      associative monoid operations by construction, so ANY merge order
      yields the same estimate (north-rule order-independence; verified by
      shuffling partition counts in tests).

Inputs are prepared JVM-side: hash sketches consume ``xxhash64(col)``
(vectorized, no Python on raw values — input_hint), quantile sketches
consume ``cast(col as double)``. At 100 TB the stage-1 pass is a single
scan with map-side reduction to #partitions x #groups tiny rows — the
shuffle moves kilobytes, not data.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import pandas as pd


def feed_series(series: pd.Series, ngram: int | None) -> np.ndarray:
    """THE batch feed: scalar values as-is, or (``ngram=n``) every
    n-token window hash via ``multi.series_window_hashes``. One shared
    kernel for the batch partials AND the streaming operators — the
    window-hash feed is a persisted-state contract (see CLAUDE.md), so
    it must never fork into per-module copies."""
    if ngram is None:
        return series.to_numpy()
    from .multi import series_window_hashes

    return series_window_hashes(series, ngram)


def _buffer_cap(sk) -> int:
    """Max buffered elements per group before materializing a real state.

    Buffering only wins while the buffered int64s (8 B/elem) cost less
    than the dense in-memory state they defer — beyond state_bytes/8
    elements the state IS the cheaper representation (theta k=256: cap
    ~258 elems; HLL p=14: ~2048; CMS eps=1e-4: ~135k capped at 2^16)."""
    nbytes = sk.approx_state_bytes() or (64 << 10)
    return max(64, min(1 << 16, nbytes // 8))


def _fold_cell(sk, cur, arr, cap: int, owned: bool):
    """One (group x sketch) accumulation step of the bounded-memory fold.

    ``cur`` is None | ["buf", [arrays], n] | ["st", state]; returns the
    new cell. ``owned`` says ``arr`` is already a standalone array (a
    groupby slice view would pin its whole source batch, so un-owned
    arrays are copied before buffering). Only valid for
    ``elementwise_update`` sketches — one concatenated update is
    bit-identical to per-batch updates."""
    if cur is None:
        if sk.elementwise_update and len(arr) < cap:
            return ["buf", [arr if owned else np.array(arr)], len(arr)]
        st = sk.new_state()
        sk.update(st, arr)
        return ["st", st]
    if cur[0] == "buf":
        cur[1].append(arr if owned else np.array(arr))
        cur[2] += len(arr)
        if cur[2] >= cap:
            st = sk.new_state()
            sk.update(st, np.concatenate(cur[1]))
            return ["st", st]
        return cur
    sk.update(cur[1], arr)
    return cur


def _emit_cell(sk, cur) -> bytes:
    """Serialize a fold cell, materializing a buffered group's dense
    state transiently (peak memory: ONE state, not one per group)."""
    if cur[0] == "st":
        return sk.to_bytes(cur[1])
    st = sk.new_state()
    sk.update(st, np.concatenate(cur[1]) if len(cur[1]) > 1 else cur[1][0])
    return sk.to_bytes(st)


class MergeableSketch(ABC):
    """A sketch monoid: (new_state, update, merge) + serialization."""

    #: "hash" -> feed xxhash64(col) int64; "value" -> feed cast-to-double;
    #: "string" -> feed the raw value cast to string (item-identity sketches
    #: like Misra-Gries that must report the original item back);
    #: "vector" -> feed the raw array<double> rows (matrix sketches like
    #: FrequentDirections whose update consumes whole embedding vectors)
    input_kind: str = "hash"

    #: True when ``update(st, concat(A, B))`` is BIT-identical to
    #: ``update(st, A); update(st, B)`` — i.e. the fold is per-element
    #: (HLL register max, Bloom bit-or, CMS counter add, theta bottom-k
    #: set union). Lets the grouped partial fold buffer raw inputs for
    #: small groups (capped at state_bytes/8 elements, past which the
    #: state is the cheaper representation) and materialize each dense
    #: state one at a time at emit, so peak memory is bounded by the
    #: partition's input column (8 B/elem) + ONE state, not #groups x
    #: state_bytes (16 KB x 10^6 groups/partition = 16 GB under the old
    #: eager-allocation fold).
    #: NOT true for KLL/t-digest (compaction points depend on batch
    #: boundaries) or Misra-Gries (trims do) — those keep the eager path.
    elementwise_update: bool = False

    # -- monoid core (numpy, Spark-free, unit-testable) ---------------------
    @abstractmethod
    def new_state(self): ...

    @abstractmethod
    def update(self, state, arr: np.ndarray) -> None:
        """Fold a batch (int64 hashes or float64 values) into ``state``."""

    @abstractmethod
    def merge(self, a, b):
        """Combine two states (commutative, associative)."""

    @abstractmethod
    def to_bytes(self, state) -> bytes: ...

    @abstractmethod
    def from_bytes(self, data: bytes): ...

    def estimate(self, state) -> float:
        """Scalar summary (cardinality etc.); optional per sketch."""
        raise NotImplementedError

    def approx_state_bytes(self) -> int | None:
        """Upper-bound estimate of one serialized state, used to decide
        whether the final collect needs a distributed pre-merge. None =
        unknown (be conservative: pre-merge whenever P is non-trivial)."""
        return None

    def approx_state_bytes_for(self, ngram: int | None) -> int | None:
        """Feed-aware variant: some sketches can bound their state only
        for specific feeds (Misra-Gries items are unbounded strings in
        general, but the ``ngram`` feed's items are int64 window hashes
        whose canonical decimal form is <= 20 bytes). Default: the
        feed-independent estimate."""
        return self.approx_state_bytes()

    # -- Spark plumbing ------------------------------------------------------
    def _input_expr(self, col: str, alias: str = "__in"):
        from pyspark.sql import functions as F

        if self.input_kind == "hash":
            # cast-to-string is the cross-type hash contract: the same
            # logical key hashes identically whether the column is long,
            # string, or decimal, so states built over differently-typed
            # copies of a key universe stay mergeable. Changing this
            # mapping would silently poison persisted states — treat it
            # like a serialization-format change (bump every hash-sketch
            # magic) if ever revisited.
            return F.xxhash64(F.col(col).cast("string")).alias(alias)
        if self.input_kind == "string":
            return F.col(col).cast("string").alias(alias)
        if self.input_kind == "vector":
            return F.col(col).cast("array<double>").alias(alias)
        return F.col(col).cast("double").alias(alias)

    #: a sketch that meaningfully folds a batch of int64 n-gram window
    #: hashes (``partials(..., ngram=n)`` feeds). True for hash-input
    #: sketches by construction; value sketches (KLL/t-digest) would
    #: compute quantiles OF hashes — meaningless — so they stay out.
    #: MisraGries overrides: its items become the gram hashes themselves
    #: (exact per-hash counting is exactly heavy-hitting over grams).
    @property
    def accepts_ngram_hashes(self) -> bool:
        return self.input_kind == "hash"

    def _check_ngram(self, ngram: int | None) -> None:
        if ngram is None:
            return
        if ngram < 1:
            raise ValueError("ngram must be >= 1")
        if not self.accepts_ngram_hashes:
            raise ValueError(
                f"{type(self).__name__} cannot fold n-gram window hashes"
                f" (input_kind={self.input_kind!r})"
            )

    def partials(self, df, col: str, keys: tuple[str, ...] = (),
                 ngram: int | None = None):
        """Stage 1: DataFrame[keys..., state binary] — one row per
        (partition x key).

        ``ngram=n`` switches the feed from the scalar ``col`` to ALL
        n-token window hashes of ``col`` (an ``array<int>`` token
        column), computed inside the kernel — the token arrays are never
        exploded into rows (see sketches/multi.py for the window-hash
        contract shared with the dedup shingle kernels)."""
        sk = self
        self._check_ngram(ngram)
        key_list = list(keys)
        if ngram is None:
            sel = [self._input_expr(col)] + key_list
            in_col = "__in"
        else:
            from pyspark.sql import functions as F

            sel = [F.col(col).alias("__arr")] + key_list
            in_col = "__arr"
        src = df.select(*sel)
        schema = (
            ", ".join(f"{k} string" for k in key_list)
            + (", " if key_list else "")
            + "state binary"
        )

        def _batch_input(series: pd.Series) -> np.ndarray:
            return feed_series(series, ngram)

        # Bounded-memory grouped fold (_fold_cell/_emit_cell): small
        # groups buffer raw inputs and materialize their dense state one
        # at a time at emit; a group whose buffer would outgrow its own
        # state (cap = state_bytes/8 elems) flushes to a real state, so
        # heavy groups cost exactly what the eager fold charged them.
        cap = _buffer_cap(self)
        # the ngram feed returns freshly-built hash arrays; the scalar
        # feed returns views into the batch, which buffering must copy
        owned = ngram is not None

        def _fold(batches):
            acc: dict[tuple, list] = {}
            for pdf in batches:
                if key_list:
                    for kv, grp in pdf.groupby(key_list, sort=False, dropna=False):
                        kt = kv if isinstance(kv, tuple) else (kv,)
                        acc[kt] = _fold_cell(
                            sk, acc.get(kt), _batch_input(grp[in_col]), cap, owned
                        )
                else:
                    acc[()] = _fold_cell(
                        sk, acc.get(()), _batch_input(pdf[in_col]), cap, owned
                    )
            if acc:
                rows = {
                    k: [str(kt[i]) for kt in acc] for i, k in enumerate(key_list)
                }
                rows["state"] = [_emit_cell(sk, cur) for cur in acc.values()]
                yield pd.DataFrame(rows)

        # NO parallelism floor here (round-6 measurement): a sketch fold
        # is ~1 cheap numpy op per row, so round-robin-shuffling the rows
        # to gain cores costs MORE than the whole single-task fold
        # (6M-row lineitem: shuffle+fold 2.5 s vs 1.3 s fold alone).
        # The floor lives only in the heavy-per-row kernels
        # (minhash/BPE/ngram surfaces), where it measured 5-10x.
        return src.mapInPandas(_fold, schema=schema)

    def build(self, df, col: str, ngram: int | None = None):
        """Global aggregate: fold the whole DataFrame into one state.

        Tree merge: with P input partitions the driver would otherwise
        collect P serialized states (a CMS state at eps=1e-5 is ~10 MB — at
        thousands of partitions that collect+sequential-loop is a driver
        bottleneck). A repartition(~sqrt(P)) pre-merge stage folds them
        distributed first — the shuffle carries states, not rows, and the
        boundary keeps stage-1 parallelism at P (a coalesce would collapse
        the partials stage itself to sqrt(P) tasks). Merge associativity
        makes the two-level fold bit-identical to the flat one (tested).

        The pre-merge is gated on the estimated collect size
        (P x approx_state_bytes > ~64 MB): at small P x small states the
        extra stage is pure fixed cost, while the driver collect is a few
        MB — both regimes get the right plan."""
        import math

        sk = self
        parts = self.partials(df, col, ngram=ngram)
        p = parts.rdd.getNumPartitions()
        fan = math.isqrt(max(1, p))
        nbytes = self.approx_state_bytes_for(ngram)
        heavy = (
            p > 4 if nbytes is None else p * nbytes > (64 << 20)
        )
        if heavy and fan > 1:

            def _pre_merge(batches):
                state = None
                for pdf in batches:
                    for b in pdf["state"]:
                        s = sk.from_bytes(bytes(b))
                        state = s if state is None else sk.merge(state, s)
                if state is not None:
                    yield pd.DataFrame({"state": [sk.to_bytes(state)]})

            parts = parts.repartition(fan).mapInPandas(
                _pre_merge, schema="state binary"
            )
        rows = parts.collect()
        state = self.new_state()
        for r in rows:
            state = self.merge(state, self.from_bytes(bytes(r["state"])))
        return state

    def aggregate(self, df, col: str, keys, est_col: str = "estimate",
                  ngram: int | None = None):
        """Per-group estimates: DataFrame[keys..., est_col double]."""
        sk = self
        keys = tuple(keys)
        parts = self.partials(df, col, keys, ngram=ngram)
        schema = ", ".join(f"{k} string" for k in keys) + f", {est_col} double"

        def _final(pdf: pd.DataFrame) -> pd.DataFrame:
            state = sk.new_state()
            for b in pdf["state"]:
                state = sk.merge(state, sk.from_bytes(bytes(b)))
            out = {k: [pdf[k].iloc[0]] for k in keys}
            out[est_col] = [float(sk.estimate(state))]
            return pd.DataFrame(out)

        return parts.groupBy(*keys).applyInPandas(_final, schema=schema)

    def states_by_key(self, df, col: str, keys, ngram: int | None = None):
        """Per-group merged states: DataFrame[keys..., state binary]."""
        sk = self
        keys = tuple(keys)
        parts = self.partials(df, col, keys, ngram=ngram)
        schema = ", ".join(f"{k} string" for k in keys) + ", state binary"

        def _final(pdf: pd.DataFrame) -> pd.DataFrame:
            state = sk.new_state()
            for b in pdf["state"]:
                state = sk.merge(state, sk.from_bytes(bytes(b)))
            out = {k: [pdf[k].iloc[0]] for k in keys}
            out["state"] = [sk.to_bytes(state)]
            return pd.DataFrame(out)

        return parts.groupBy(*keys).applyInPandas(_final, schema=schema)

    def _require_estimate(self) -> None:
        if type(self).estimate is MergeableSketch.estimate:
            raise ValueError(
                f"{type(self).__name__} has no scalar estimate — use "
                "agg_state_column / states_by_key for raw states"
            )

    def _fold_series(self, s: pd.Series):
        """One-group UDAF fold shared by every grouped-agg closure —
        change the fold ONCE here (e.g. null handling) and the
        DataFrame-estimate, state, and SQL surfaces stay in lockstep.
        The astype is a no-op when the input was cast JVM-side
        (``_input_expr``) and repairs the dtype for the SQL path, where
        the raw column arrives unprepped."""
        st = self.new_state()
        arr = s.to_numpy()
        if self.input_kind == "value":
            arr = arr.astype(np.float64, copy=False)
        self.update(st, arr)
        return st

    # -- literal grouped-agg UDAF surface ------------------------------------
    def agg_estimate_column(self, col: str, alias: str | None = None):
        """A real Spark aggregate expression:
        ``df.groupBy(k).agg(sk.agg_estimate_column("doc_id"))``.

        Convenience/interop surface ONLY. Grouped-agg pandas UDFs have NO
        partial aggregation: the full (JVM-hashed) input column shuffles
        and every group materializes as one pandas Series in one task —
        fine for interactive use and moderate groups, wrong at 10^12
        rows. The scale path remains ``aggregate()``/``states_by_key``
        (map-side fold, states-not-rows shuffle). Estimates are identical
        to ``build()`` for elementwise sketches (one concatenated update
        == any partition split)."""
        from pyspark.sql import functions as F

        self._require_estimate()
        sk = self

        @F.pandas_udf("double")
        def _agg(s: pd.Series) -> float:
            return float(sk.estimate(sk._fold_series(s)))

        return _agg(self._input_expr(col)).alias(
            alias or f"{type(self).__name__.lower()}_{col}"
        )

    def agg_state_column(self, col: str, alias: str | None = None):
        """Like ``agg_estimate_column`` but returns the serialized state
        (binary) — feed the resulting table to ``merge_state_tables`` or
        persist it as an incremental-profile generation. Same no-partial-
        aggregation caveat."""
        from pyspark.sql import functions as F

        sk = self

        @F.pandas_udf("binary")
        def _agg(s: pd.Series) -> bytes:
            return sk.to_bytes(sk._fold_series(s))

        return _agg(self._input_expr(col)).alias(alias or "state")

    def register_sql_agg(self, spark, name: str):
        """Register the estimate UDAF for Spark SQL. The registered
        function takes the PRE-HASHED input (hash sketches) or the raw
        value (value sketches) — SQL cannot apply the JVM-side input
        prep inside a Python UDAF, so hash-input sketches are queried as::

            SELECT source, <name>(xxhash64(CAST(doc_id AS STRING)))
            FROM t GROUP BY source

        which is exactly the cross-type hash contract the DataFrame
        surface applies automatically (states stay mergeable with every
        other build of the same config)."""
        from pyspark.sql import functions as F

        self._require_estimate()
        sk = self

        @F.pandas_udf("double")
        def _agg(s: pd.Series) -> float:
            return float(sk.estimate(sk._fold_series(s)))

        spark.udf.register(name, _agg)
        return name

    def merge_state_tables(self, tables, keys):
        """Merge several per-key state tables (the ``states_by_key`` /
        ``profile_by_key`` output shape: DataFrame[keys... string, state
        binary]) into one — the incremental-profiling primitive: persist
        each ingest batch's states to parquet, then fold any set of them
        without rescanning the underlying rows. At 10^12 sequences the
        state tables are G rows regardless of corpus size, so an
        incremental daily update costs one scan of the NEW data plus this
        G-row merge. Merge associativity makes the result value-identical
        to a single build over the concatenated inputs (byte-identical
        for batch-order-insensitive states; tested). A key present in
        only some tables merges over the tables that have it. States must
        come from this sketch's config — ``from_bytes`` raises on a
        config mismatch (serialization headers carry the parameters).
        ``profile_by_key`` tables carry an extra ``name`` column (one row
        per spec per group); it is treated as an implicit extra group key
        and kept in the output, so two same-config specs never silently
        merge into one state."""
        sk = self
        keys = tuple(keys)
        if not tables:
            raise ValueError("merge_state_tables needs at least one table")
        df = tables[0]
        for t in tables[1:]:
            df = df.unionByName(t)
        group_cols = list(keys)
        if "name" in df.columns and "name" not in group_cols:
            group_cols.append("name")
        schema = ", ".join(f"{k} string" for k in group_cols) + ", state binary"

        def _final(pdf: pd.DataFrame) -> pd.DataFrame:
            state = sk.new_state()
            for b in pdf["state"]:
                state = sk.merge(state, sk.from_bytes(bytes(b)))
            out = {k: [pdf[k].iloc[0]] for k in group_cols}
            out["state"] = [sk.to_bytes(state)]
            return pd.DataFrame(out)

        return df.groupBy(*group_cols).applyInPandas(_final, schema=schema)
