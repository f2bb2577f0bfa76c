"""Incrementally-maintained per-key sketch state tables over an
append-only source (north rule: resumable builds with per-partition
lineage + metrics, extended to a table that GROWS between runs).

A 10^12-sequence corpus is not rebuilt nightly; it is appended to. The
sketch monoid makes maintenance incremental by construction: persist the
per-key state table (G keys x S specs rows, KB each — size independent of
corpus row count), and on each run scan ONLY the input files that were
never folded, then merge the new partials into the persisted table
(`MergeableSketch.merge_state_tables` semantics, multi-spec here). Each
update therefore costs one scan of the NEW data plus a (G x S)-row
states-not-rows merge, regardless of how large the already-folded corpus
is.

On Iceberg the "which files are new" question is answered by the table
format itself (incremental snapshot-range reads:
``spark.read.format("iceberg").option("start-snapshot-id", ...)`` — see
io.py); on plain parquet directories (this sandbox) this module keeps its
own processed-file manifest, which doubles as the lineage/metrics record
(file, generation, rows folded, run id, wall seconds).

Commit protocol (mirrors sketches/checkpoint.py's crash-window analysis):
the new state table is written to ``<path>/state/gen=<g>`` FIRST
(parquet job commit is atomic), then the processed-file rows are appended
to ``<path>/lineage``. The committed generation is defined by the
lineage table, so a crash between the two writes leaves an orphaned
``gen`` directory that the next update ignores (its files still read as
unprocessed) and overwrites. A config manifest pins (keys, spec names,
sketch fingerprints, columns, ngram feeds) at first commit and refuses
mismatched resumes — a state table folded under one config must never be
extended under another (same failure mode as the checkpoint manifests:
count checks pass, estimates silently lie).

Reference analogue: minperf processes key sets too large for one pass as
resumable chunked runs (LargeSetTest.java chunked 10^8 builds); the
incremental table is the same idea turned into a standing, growable
artifact.
"""

from __future__ import annotations

import time

import pandas as pd

from .base import MergeableSketch
from .checkpoint import _sketch_fingerprint
from .multi import SketchSpec, profile_by_key


def _canon_file(p: str) -> str:
    """Canonicalize a data-file URI so Hadoop listing output
    (``file:/root/x.parquet``) and ``input_file_name()`` output
    (``file:///root/x.parquet``) compare equal. Schemes with a real
    authority (hdfs://nn:8020/..., s3a://bucket/...) are already
    identical on both sides and pass through unchanged."""
    if p.startswith("file:"):
        return "file:///" + p[5:].lstrip("/")
    return p


def _list_data_files(spark, source: str) -> list[str]:
    """Recursively list data files under ``source`` via the Hadoop
    FileSystem API (works for any scheme Spark can read), skipping
    hidden/commit-protocol entries (``_SUCCESS``, ``.crc`` ...)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(source)
    fs = root.getFileSystem(conf)
    out: list[str] = []
    stack = [root]
    while stack:
        p = stack.pop()
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                out.append(_canon_file(st.getPath().toString()))
    return sorted(out)


def merge_profile_tables(tables, keys, specs):
    """Merge ``profile_by_key``-shaped tables (keys... string, name
    string, state binary) with per-``name`` sketch dispatch — the
    multi-spec analogue of ``MergeableSketch.merge_state_tables``. One
    groupBy over G x S rows; associativity makes any grouping of input
    tables value-identical to a single build over the concatenated
    sources."""
    by_name = {s.name: s.sketch for s in specs}
    keys = list(keys)
    if not tables:
        raise ValueError("merge_profile_tables needs at least one table")
    df = tables[0]
    for t in tables[1:]:
        df = df.unionByName(t)
    group_cols = keys + ["name"]
    schema = ", ".join(f"{k} string" for k in group_cols) + ", state binary"

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = by_name[pdf["name"].iloc[0]]
        state = None
        for b in pdf["state"]:
            s = sk.from_bytes(bytes(b))
            state = s if state is None else sk.merge(state, s)
        out = {k: [pdf[k].iloc[0]] for k in group_cols}
        out["state"] = [sk.to_bytes(state)]
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(_final, schema=schema)


class IncrementalProfile:
    """A persisted, incrementally-updated per-key state table for a set
    of sketch specs (see module docstring)."""

    def __init__(self, specs: list[SketchSpec], keys, path: str) -> None:
        self.specs = list(specs)
        self.keys = list(keys)
        self.path = path
        if not self.keys:
            raise ValueError(
                "IncrementalProfile needs at least one group key; for a "
                "single global state use sketches.checkpoint."
                "CheckpointedBuild (waved resumable global fold)"
            )
        if not self.specs:
            raise ValueError("IncrementalProfile needs at least one spec")
        names = [s.name for s in self.specs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate spec names: {sorted(names)}")

    # -- manifests -----------------------------------------------------------
    def _config_rows(self) -> list[tuple]:
        key_sig = ",".join(self.keys)
        return sorted(
            (
                key_sig,
                s.name,
                _sketch_fingerprint(s.sketch),
                s.col,
                int(s.ngram or 0),
            )
            for s in self.specs
        )

    def _check_or_write_manifest(self, spark) -> None:
        rows = self._config_rows()
        schema = "keys string, name string, fingerprint string, col string, ngram int"
        try:
            have = sorted(
                tuple(r) for r in spark.read.parquet(f"{self.path}/manifest")
                .select("keys", "name", "fingerprint", "col", "ngram")
                .collect()
            )
        except Exception:  # noqa: BLE001 — no readable manifest yet
            # Like the checkpoint manifests: a path with committed work
            # but no manifest must not be silently adopted under the
            # current config.
            if self._committed_gen(spark) > 0:
                raise ValueError(
                    f"incremental profile at {self.path} has committed "
                    "generations but no readable manifest; re-run against "
                    "a fresh path or restore the manifest"
                ) from None
            spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
                f"{self.path}/manifest"
            )
            return
        have = [(r[0], r[1], r[2], r[3], int(r[4])) for r in have]
        if have != rows:
            raise ValueError(
                "incremental profile manifest mismatch: committed config "
                f"{have} != requested {rows}; update with the original "
                "specs/keys or use a fresh path"
            )

    def _committed_gen(self, spark) -> int:
        from pyspark.sql import functions as F

        try:
            row = (
                spark.read.parquet(f"{self.path}/lineage")
                .agg(F.max("gen").alias("g"))
                .collect()[0]
            )
            return int(row["g"] or 0)
        except Exception:  # noqa: BLE001 — first run: no lineage yet
            return 0

    # -- update --------------------------------------------------------------
    def update(self, spark, source: str | None = None,
               files: list[str] | None = None) -> dict:
        """Fold every not-yet-processed data file into the state table.

        ``source`` is a directory to diff against the lineage manifest
        (recursive listing); ``files`` is an explicit list (the Iceberg
        snapshot-diff integration point — pass the files of a snapshot
        range). Returns ``{"gen", "new_files", "rows"}``; a no-op update
        (nothing new) leaves the committed generation untouched."""
        from pyspark.sql import functions as F

        if (source is None) == (files is None):
            raise ValueError("pass exactly one of source= or files=")
        t0 = time.time()
        self._check_or_write_manifest(spark)
        cur_gen = self._committed_gen(spark)
        all_files = (
            sorted(_canon_file(f) for f in files)
            if files is not None
            else _list_data_files(spark, source)
        )
        if cur_gen > 0:
            done = {
                r["file"]
                for r in spark.read.parquet(f"{self.path}/lineage")
                .select("file")
                .collect()
            }
        else:
            done = set()
        new = [f for f in all_files if f not in done]
        if not new:
            return {"gen": cur_gen, "new_files": 0, "rows": 0}

        df_new = spark.read.parquet(*new)
        new_states = profile_by_key(df_new, self.keys, self.specs)
        if cur_gen > 0:
            cur = spark.read.parquet(f"{self.path}/state/gen={cur_gen}")
            merged = merge_profile_tables(
                [cur, new_states], self.keys, self.specs
            )
        else:
            merged = new_states
        gen = cur_gen + 1
        # state first, lineage second: the committed generation is
        # DEFINED by the lineage table, so a crash in between leaves an
        # orphaned gen dir whose files re-fold next run (and the orphan
        # is overwritten) — never a silently-missing or double-counted
        # batch. overwrite mode for the same reason as the checkpoint
        # wave commits.
        merged.write.mode("overwrite").parquet(f"{self.path}/state/gen={gen}")
        # per-file row counts: zero-data-column parquet scan (the
        # grouping column is metadata), #new_files tiny rows collected
        counts = {
            _canon_file(r["f"]): int(r["count"])
            for r in df_new.groupBy(F.input_file_name().alias("f"))
            .count()
            .collect()
        }
        run_id = f"run-{int(time.time())}"
        wall = round(time.time() - t0, 3)
        spark.createDataFrame(
            [(f, gen, counts.get(f, 0), run_id, wall) for f in new],
            "file string, gen int, n_rows long, lineage string, wall_sec double",
        ).write.mode("append").parquet(f"{self.path}/lineage")
        return {"gen": gen, "new_files": len(new), "rows": sum(counts.values())}

    # -- reads ---------------------------------------------------------------
    def states(self, spark):
        """Current committed state table: DataFrame[keys... string, name
        string, state binary]."""
        gen = self._committed_gen(spark)
        if gen == 0:
            raise ValueError(f"no committed updates under {self.path}")
        return spark.read.parquet(f"{self.path}/state/gen={gen}")

    def estimates(self, spark, names=None, est_col: str = "estimate"):
        """Scalar estimates from the committed table: DataFrame[keys...,
        name, est_col double]. ``names=None`` covers every spec whose
        sketch has a scalar estimate; explicitly requesting a spec
        without one (CMS/Bloom — point-query sketches) raises (fetch
        their states via ``states``)."""
        have = {
            s.name: s.sketch
            for s in self.specs
            if type(s.sketch).estimate is not MergeableSketch.estimate
        }
        if names is None:
            names = sorted(have)
        for nm in names:
            if nm not in have:
                sk = next((s for s in self.specs if s.name == nm), None)
                if sk is None:
                    raise ValueError(f"unknown spec name {nm!r}")
                raise ValueError(
                    f"spec {nm!r}: {type(sk.sketch).__name__} has no "
                    "scalar estimate — read raw states via states()"
                )
        by_name = {nm: have[nm] for nm in names}
        keys = self.keys
        schema = (
            ", ".join(f"{k} string" for k in keys)
            + f", name string, {est_col} double"
        )

        def _est(batches):
            for pdf in batches:
                out = {k: pdf[k] for k in keys}
                out["name"] = pdf["name"]
                out[est_col] = [
                    float(
                        by_name[n].estimate(by_name[n].from_bytes(bytes(b)))
                    )
                    for n, b in zip(pdf["name"], pdf["state"])
                ]
                yield pd.DataFrame(out)

        from pyspark.sql import functions as F

        src = self.states(spark).filter(F.col("name").isin(list(names)))
        return src.mapInPandas(_est, schema=schema)

    def lineage(self, spark):
        """Processed-file lineage + metrics: DataFrame[file, gen,
        n_rows, lineage (run id), wall_sec]."""
        return spark.read.parquet(f"{self.path}/lineage")
