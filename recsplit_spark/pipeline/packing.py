"""Sequence packing — fixed-capacity training examples from token arrays.

Two packers over the north-rule token payload, both per-group (the only
shape that scales: packing is assignment, and any globally-optimal
assignment of 10^12 docs is a serial problem nobody needs — per-group
quality is within one bin of optimal per group, see the invariant
below):

- :func:`pack_bins` — boundary-respecting best-fit-decreasing: every doc
  lands whole in exactly one bin of ``capacity`` tokens (docs longer than
  capacity are split/truncated/rejected per ``long_doc``). Any-fit
  guarantee: within a group at most ONE bin ends less than half
  full — if two were, the later bin's first (largest) item would have
  fit the earlier — so bins_used < 2 x OPT + G. Use when examples must
  not cross document boundaries (masked-attention training).
- :func:`pack_concat` — concatenate-and-chunk (the T5/GPT "packing"
  shape): docs are concatenated in deterministic order and the flat
  stream is cut every ``capacity`` tokens, docs crossing cuts. Zero
  padding except the final chunk per group; fully vectorized
  (flat-buffer cumsum, no per-doc Python). Each bin carries
  ``doc_ids`` + ``doc_starts`` so the trainer can rebuild attention
  boundaries.

Determinism: ``deterministic=True`` (default) assigns each doc to one of
``partitions`` VALUE-defined groups (pmod of the id hash) and packs each
group in id-hash order via ``groupBy().applyInPandas`` — bins are then a
pure function of (input set, partitions, capacity), identical on any
cluster, any physical partitioning, any run (a ``repartitionByRange``
would NOT be: its boundaries come from runtime sampling). Pass
``deterministic=False`` to pack physical partitions as they come with
``mapInPandas`` — zero shuffle, the right call when the upstream stage
already placed the data.

Scale shape at 10^12 sequences: one hash exchange of the token rows
(the payload must co-locate with its bin by definition — this shuffle is
the op, not overhead), then one Arrow kernel pass per group; no driver
state, no second exchange. Bin ids are (group, ordinal) pairs, unique by
construction.

Reference scope note: minperf has no packing surface; this module exists
for the north-rule training-data pipeline (token payload, axes A+B).
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np
import pandas as pd

_OUT_SCHEMA = (
    "bin_id string, doc_ids array<string>, doc_starts array<int>,"
    " tokens array<int>, n_tok int, pad int"
)


def _batch_rows(pdf, col_id="__id", col_arr="__arr"):
    ids: list[str] = []
    arrs: list[np.ndarray] = []
    for i, a in zip(pdf[col_id], pdf[col_arr]):
        ids.append(str(i))
        arrs.append(
            np.asarray(a, dtype=np.int32)
            if a is not None
            else np.empty(0, np.int32)
        )
    return ids, arrs


def _pack_bins_core(ids, arrs, gid, cap, long_doc):
    """Best-fit-decreasing over one group; returns the output columns."""
    split_ids: list[str] = []
    split_arrs: list[np.ndarray] = []
    for i, arr in zip(ids, arrs):
        if len(arr) > cap:
            if long_doc == "error":
                raise ValueError(
                    f"doc {i!r} has {len(arr)} tokens > capacity {cap}"
                )
            if long_doc == "truncate":
                split_ids.append(i)
                split_arrs.append(arr[:cap])
                continue
            for j, s in enumerate(range(0, len(arr), cap)):
                split_ids.append(f"{i}#part{j}")
                split_arrs.append(arr[s : s + cap])
        else:
            split_ids.append(i)
            split_arrs.append(arr)
    ids, arrs = split_ids, split_arrs
    lens = np.fromiter((len(a) for a in arrs), np.int64, count=len(arrs))
    # length-descending, id tie-break: deterministic fill order
    order = sorted(range(len(ids)), key=lambda t: (-lens[t], ids[t]))
    rems: list[int] = []  # sorted ascending remaining capacities
    rbin: list[int] = []  # parallel bin ordinals
    bins: list[list[int]] = []  # doc indices per bin
    for t in order:
        need = int(lens[t])
        p = bisect_left(rems, need)
        if p == len(rems):
            b = len(bins)
            bins.append([t])
            rem = cap - need
        else:
            b = rbin.pop(p)
            rem = rems.pop(p) - need
            bins[b].append(t)
        if rem > 0:
            q = bisect_left(rems, rem)
            rems.insert(q, rem)
            rbin.insert(q, b)
    out = {k: [] for k in (
        "bin_id", "doc_ids", "doc_starts", "tokens", "n_tok", "pad")}
    for b, members in enumerate(bins):
        toks = (
            np.concatenate([arrs[t] for t in members])
            if members
            else np.empty(0, np.int32)
        )
        starts = np.concatenate(
            ([0], np.cumsum(lens[members][:-1]))
        ).astype(np.int32)
        out["bin_id"].append(f"{gid}-{b}")
        out["doc_ids"].append([ids[t] for t in members])
        out["doc_starts"].append(starts)
        out["tokens"].append(toks)
        out["n_tok"].append(len(toks))
        out["pad"].append(cap - len(toks))
    return out


def _pack_concat_core(ids, arrs, gid, cap):
    """Concatenate-and-chunk over one group; returns the output columns."""
    lens = np.fromiter((len(a) for a in arrs), np.int64, count=len(arrs))
    flat = np.concatenate(arrs) if arrs else np.empty(0, np.int32)
    total = len(flat)
    if total == 0:
        return None
    doc_starts_g = np.concatenate(([0], np.cumsum(lens)[:-1]))
    n_bins = (total + cap - 1) // cap
    # segment table: for every (doc x bin) overlap, the doc's start
    # offset within that bin — vectorized interval arithmetic.
    # Zero-length docs have no tokens and therefore no segment.
    nz = np.flatnonzero(lens > 0)
    first_bin = doc_starts_g[nz] // cap
    last_bin = (doc_starts_g[nz] + lens[nz] - 1) // cap
    seg_counts = (last_bin - first_bin + 1).astype(np.int64)
    seg_doc_nz = np.repeat(np.arange(len(nz), dtype=np.int64), seg_counts)
    seg_doc = nz[seg_doc_nz]
    seg_ord = np.arange(len(seg_doc)) - np.repeat(
        np.cumsum(seg_counts) - seg_counts, seg_counts
    )
    seg_bin = first_bin[seg_doc_nz] + seg_ord
    seg_start = np.maximum(
        doc_starts_g[seg_doc] - seg_bin * cap, 0
    ).astype(np.int32)
    out = {k: [] for k in (
        "bin_id", "doc_ids", "doc_starts", "tokens", "n_tok", "pad")}
    bin_bounds = np.searchsorted(seg_bin, np.arange(n_bins + 1))
    for b in range(n_bins):
        lo, hi = b * cap, min((b + 1) * cap, total)
        s0, s1 = bin_bounds[b], bin_bounds[b + 1]
        out["bin_id"].append(f"{gid}-{b}")
        out["doc_ids"].append([ids[d] for d in seg_doc[s0:s1]])
        out["doc_starts"].append(seg_start[s0:s1])
        out["tokens"].append(flat[lo:hi])
        out["n_tok"].append(hi - lo)
        out["pad"].append(cap - (hi - lo))
    return out


def _run_packer(df, id_col, col, deterministic, partitions, core):
    """Shared dispatch: value-defined groups (deterministic) or physical
    partitions (zero extra shuffle)."""
    from pyspark.sql import functions as F

    # the output schema declares array<int>; wider element types would
    # silently wrap in the kernel's int32 buffers
    elem = df.schema[col].dataType.elementType.simpleString()
    if elem not in ("int", "smallint", "tinyint"):
        raise ValueError(
            f"{col} must be an array of int32-or-narrower tokens,"
            f" got array<{elem}>"
        )
    src = df.select(F.col(id_col).alias("__id"), F.col(col).alias("__arr"))
    if deterministic:
        p = int(
            partitions
            or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        src = src.withColumn(
            "__h", F.xxhash64(F.col("__id").cast("string"))
        ).withColumn("__b", F.pmod(F.col("__h"), F.lit(p)).cast("int"))

        def _group(pdf: pd.DataFrame) -> pd.DataFrame:
            # id tie-break: a 64-bit hash collision (real at 10^12 docs)
            # must not let shuffle arrival order leak into bin contents
            pdf = pdf.sort_values(["__h", "__id"], kind="mergesort")
            ids, arrs = _batch_rows(pdf)
            out = core(ids, arrs, int(pdf["__b"].iloc[0]))
            return (
                pd.DataFrame(out)
                if out
                else pd.DataFrame(
                    {k: [] for k in (
                        "bin_id", "doc_ids", "doc_starts", "tokens",
                        "n_tok", "pad")}
                )
            )

        return src.groupBy("__b").applyInPandas(_group, schema=_OUT_SCHEMA)

    def _partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        ids: list[str] = []
        arrs: list[np.ndarray] = []
        for pdf in batches:
            i2, a2 = _batch_rows(pdf)
            ids.extend(i2)
            arrs.extend(a2)
        if not ids:
            return
        out = core(ids, arrs, pid)
        if out:
            yield pd.DataFrame(out)

    return src.mapInPandas(_partition, schema=_OUT_SCHEMA)


def pack_bins(
    df,
    capacity: int,
    id_col: str = "doc_id",
    col: str = "tokens",
    long_doc: str = "split",
    deterministic: bool = True,
    partitions: int | None = None,
):
    """Boundary-respecting packing: DataFrame[bin_id, doc_ids,
    doc_starts, tokens, n_tok, pad] where every input doc appears whole
    in exactly one bin and ``n_tok <= capacity`` (``pad`` = capacity -
    n_tok; the tokens are NOT padded — the pad token is the trainer's
    choice). ``long_doc``: 'split' chunks docs longer than capacity
    (full chunks become their own bins, the remainder joins the pool,
    ids suffixed ``#part<j>``), 'truncate' cuts them to capacity,
    'error' raises.

    Best-fit-decreasing per group: docs sorted by length descending,
    each placed in the fullest bin that still fits (sorted remaining-
    capacity list, O(n log n + moves)). At most one bin per group ends
    below half capacity (any-fit property)."""
    if long_doc not in ("split", "truncate", "error"):
        raise ValueError(
            f"long_doc must be split|truncate|error, got {long_doc!r}"
        )
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    cap = int(capacity)
    return _run_packer(
        df,
        id_col,
        col,
        deterministic,
        partitions,
        lambda ids, arrs, gid: _pack_bins_core(ids, arrs, gid, cap, long_doc),
    )


def pack_concat(
    df,
    capacity: int,
    id_col: str = "doc_id",
    col: str = "tokens",
    deterministic: bool = True,
    partitions: int | None = None,
):
    """Concatenate-and-chunk packing: DataFrame[bin_id, doc_ids,
    doc_starts, tokens, n_tok, pad]. Per group the doc streams are
    concatenated (id-hash order under ``deterministic``) and cut every
    ``capacity`` tokens; docs cross cuts, so every bin except the
    group's last has ``n_tok == capacity`` and ``pad == 0`` — total
    padding is at most (capacity - 1) x groups tokens over the whole
    corpus. ``doc_ids``/``doc_starts`` list each doc SEGMENT present in
    the bin and its start offset (a crossing doc appears in consecutive
    bins; its continuation segment starts at 0; zero-length docs carry
    no segment)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    cap = int(capacity)
    return _run_packer(
        df,
        id_col,
        col,
        deterministic,
        partitions,
        lambda ids, arrs, gid: _pack_concat_core(ids, arrs, gid, cap),
    )
