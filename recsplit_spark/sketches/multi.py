"""One-pass fused multi-sketch profiling — S sketches, ONE scan.

At 100 TB the table scan *is* the cost of a sketch build: every
``MergeableSketch.build`` call re-reads the input, so profiling a corpus
with HLL + CMS + KLL + Bloom pays four full scans for four states whose
combined size is a few MB. ``profile`` folds any number of sketch specs
into a single ``mapInPandas`` pass over one projection of the input —
one scan, one stage-1 task set, per-(partition x spec) serialized states
out — then merges exactly like the single-sketch path (distributed
salt pre-merge when the collect would be heavy, driver fold otherwise).
Because every sketch is a commutative monoid, the fused fold is
value-identical to S independent builds (byte-identical for
batch-order-insensitive states: HLL register max, CMS counter sums,
Bloom bit ors — tested).

Token n-gram feeds: a spec may target the ``tokens:array<int32>``
payload directly (``ngram=n``). The stage-1 kernel then computes ALL
n-token window hashes per document — the same polynomial/mix window
hash as the dedup shingle kernels (``pipeline.dedup._rolling_hash_batch``),
so states built here stay compatible with hashes produced there — and
feeds them to the sketch without ever exploding the token arrays into
rows (a posexplode at 10^12 sequences x ~500 tokens would 500x the rows
through the scan; here the windows live only as a transient uint64
array inside the kernel). Unlike the dedup kernels (which pad short
docs for set semantics), counting semantics apply: a doc shorter than
n contributes no n-grams.

Reference scope note: the reference library (minperf) has no multi-sketch
or n-gram surface — this module exists for the north-rule training-data
pipeline (distinct token/n-gram cardinality + frequency in one pass).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..hashing import mix64
from .base import MergeableSketch, _buffer_cap, _emit_cell, _fold_cell


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to fold during the single profiling scan.

    ``col`` is a scalar column (hashed/cast JVM-side exactly as the
    sketch's own ``build`` would) unless ``ngram`` is set, in which case
    ``col`` must be an ``array<int>`` token column and the sketch (which
    must be ``input_kind == 'hash'``) is fed every n-token window hash.
    """

    name: str
    sketch: MergeableSketch
    col: str
    ngram: int | None = None


def parse_spec(
    text: str,
    *,
    hll_p: int = 14,
    cms_eps: float = 5e-4,
    cms_delta: float = 0.01,
    bloom_n: int = 1_000_000,
    bloom_fpr: float = 0.01,
    theta_k: int = 4096,
    mg_k: int = 1024,
) -> "SketchSpec":
    """Parse a ``name=kind:col[:ngram=N]`` spec string into a SketchSpec.

    The one parser behind both job scripts' ``--spec``/``--profile-spec``
    flags (scripts/incremental_job.py, scripts/ingest_job.py) — lives in
    the library so a deployed entry script plus dist/recsplit_spark.zip
    is self-contained (no sibling-script import at runtime). Raises
    ``ValueError`` on a malformed spec; the CLIs wrap it in SystemExit.
    """
    from . import (
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        MisraGries,
        ThetaSketch,
    )

    try:
        name, rest = text.split("=", 1)
        parts = rest.split(":")
        kind, col = parts[0], parts[1]
        ngram = None
        for extra in parts[2:]:
            k, v = extra.split("=", 1)
            if k != "ngram":
                raise ValueError(f"unknown spec option {k!r}")
            ngram = int(v)
    except (ValueError, IndexError) as e:
        raise ValueError(
            f"bad spec {text!r} (want name=kind:col[:ngram=N]): {e}"
        ) from None
    mk = {
        "hll": lambda: HyperLogLog(p=hll_p),
        "cms": lambda: CountMinSketch(eps=cms_eps, delta=cms_delta),
        "bloom": lambda: BloomFilter(n_expected=bloom_n, fpr=bloom_fpr),
        "theta": lambda: ThetaSketch(k=theta_k),
        "mg": lambda: MisraGries(k=mg_k),
    }.get(kind)
    if mk is None:
        raise ValueError(f"bad spec {text!r}: unknown sketch kind {kind!r}")
    return SketchSpec(name, mk(), col, ngram=ngram)


def _flat_ngram_hashes_pos(
    flat: np.ndarray, lens: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """ALL n-token window hashes of a flat concatenated token buffer
    (``lens`` = per-doc token counts), plus each window's start offset
    into ``flat`` (the resolve kernels slice the actual gram back out).
    Same window polynomial + mix64 as ``pipeline.dedup._rolling_hash_batch``
    so hashes interoperate with the shingle/MinHash kernels; no padding
    and no per-doc dedup — counting semantics (docs with < n tokens emit
    nothing)."""
    from ..pipeline.dedup import _SHINGLE_PRIME

    if len(lens) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    buf = np.ascontiguousarray(flat, dtype=np.uint64)
    n_sh = np.maximum(lens - n + 1, 0)
    total = int(n_sh.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    out_h = np.empty(total, dtype=np.uint64)
    out_pos = np.empty(total, dtype=np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    win_ends = np.cumsum(n_sh)
    pows = _SHINGLE_PRIME ** np.arange(n, dtype=np.uint64)
    # Compute in ~64K-window doc-range chunks so the ~8 window-sized
    # temporaries (doc_of/local/pos/raw/mix64 intermediates) stay
    # cache-resident instead of streaming DRAM — measured 5.8x
    # single-core at 26M windows (4.76 s -> 0.82 s), identical output;
    # the gap widens under executor concurrency on shared-bandwidth
    # hosts. Chunk cuts land on document boundaries, so the window
    # polynomial sees exactly the same per-doc slices.
    chunk_w = 1 << 16
    if total <= chunk_w:
        bounds = np.array([0, len(lens)])
    else:
        cuts = np.searchsorted(
            win_ends, np.arange(chunk_w, total, chunk_w), side="left"
        )
        bounds = np.unique(np.concatenate([[0], cuts + 1, [len(lens)]]))
    for a, b in zip(bounds[:-1], bounds[1:]):
        w0 = 0 if a == 0 else int(win_ends[a - 1])
        w1 = int(win_ends[b - 1])
        if w1 <= w0:
            continue
        nsh = n_sh[a:b]
        doc_of = np.repeat(np.arange(b - a, dtype=np.int64), nsh)
        ends = np.cumsum(nsh)
        local = np.arange(w1 - w0, dtype=np.int64) - np.repeat(ends - nsh, nsh)
        pos = doc_starts[a:b][doc_of] + local
        raw = np.zeros(w1 - w0, dtype=np.uint64)
        for j in range(n):
            raw += buf[pos + j] * pows[j]
        out_h[w0:w1] = mix64(raw)
        out_pos[w0:w1] = pos
    return out_h, out_pos


def _flat_ngram_hashes(flat: np.ndarray, lens: np.ndarray, n: int) -> np.ndarray:
    return _flat_ngram_hashes_pos(flat, lens, n)[0]


def token_ngram_hashes(tokens, n: int) -> np.ndarray:
    """All n-gram window hashes of ONE token array (int64 view) — the
    query-side companion: hash an n-gram with this to point-query a CMS
    state built by ``profile`` over the same column."""
    t = np.asarray(tokens, dtype=np.int64)
    return _flat_ngram_hashes(
        t.astype(np.uint64), np.array([len(t)], dtype=np.int64), n
    ).view(np.int64)


def series_window_hashes(series: pd.Series, n: int) -> np.ndarray:
    """int64 window hashes of a pandas Series of token arrays — the batch
    feed behind every ``ngram=n`` entry point (batch partials and the
    streaming stateful operators share this exact kernel, which is what
    makes stream-vs-batch state byte-identity hold)."""
    flat, lens = _series_to_flat(series)
    return _flat_ngram_hashes(flat, lens, n).view(np.int64)


def _series_to_flat(series: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a pandas Series of token arrays (mapInPandas list-column
    layout: one numpy array per row; None → empty)."""
    arrs = [
        np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
        for a in series
    ]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    flat = (
        np.concatenate(arrs).astype(np.uint64)
        if arrs
        else np.empty(0, np.uint64)
    )
    return flat, lens


def _validate(specs: list[SketchSpec]) -> None:
    names = [s.name for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate spec names: {names}")
    for s in specs:
        if s.ngram is not None:
            if not s.sketch.accepts_ngram_hashes:
                raise ValueError(
                    f"spec {s.name!r}: {type(s.sketch).__name__} cannot fold"
                    f" n-gram window hashes"
                    f" (input_kind={s.sketch.input_kind!r})"
                )
            if s.ngram < 1:
                raise ValueError(f"spec {s.name!r}: ngram must be >= 1")


def _stage1(df, specs: list[SketchSpec]):
    """The single-scan partial fold: DataFrame[name string, state binary],
    one row per (input partition x spec). Exposed for plan tests (the
    profile contract is exactly ONE scan of ``df``)."""
    from pyspark.sql import functions as F

    _validate(specs)
    # Deduplicate projections: scalar specs sharing (col, input_kind) read
    # one column; ngram specs sharing a col read the raw array once.
    proj: dict[tuple, str] = {}
    exprs = []
    spec_alias: list[str] = []
    for s in specs:
        if s.ngram is None:
            key = ("scalar", s.col, s.sketch.input_kind)
            if key not in proj:
                alias = f"__in_{len(proj)}"
                proj[key] = alias
                exprs.append(s.sketch._input_expr(s.col, alias=alias))
        else:
            key = ("array", s.col)
            if key not in proj:
                alias = f"__arr_{len(proj)}"
                proj[key] = alias
                exprs.append(F.col(s.col).alias(alias))
        spec_alias.append(proj[key])

    src = df.select(*exprs)
    sketches = [s.sketch for s in specs]
    names = [s.name for s in specs]
    ngrams = [s.ngram for s in specs]

    def _fold(batches):
        states = [None] * len(names)
        for pdf in batches:
            flat_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            # hashes cached per (array column, n): specs sharing a window
            # feed (e.g. HLL + CMS over the same 5-grams) hash ONCE
            hash_cache: dict[tuple[str, int], np.ndarray] = {}
            for i, sk in enumerate(sketches):
                if states[i] is None:
                    states[i] = sk.new_state()
                if ngrams[i] is None:
                    sk.update(states[i], pdf[spec_alias[i]].to_numpy())
                else:
                    alias = spec_alias[i]
                    hkey = (alias, ngrams[i])
                    h = hash_cache.get(hkey)
                    if h is None:
                        if alias not in flat_cache:
                            flat_cache[alias] = _series_to_flat(pdf[alias])
                        flat, lens = flat_cache[alias]
                        h = _flat_ngram_hashes(flat, lens, ngrams[i]).view(np.int64)
                        hash_cache[hkey] = h
                    sk.update(states[i], h)
        got = [i for i, st in enumerate(states) if st is not None]
        if got:
            yield pd.DataFrame(
                {
                    "name": [names[i] for i in got],
                    "state": [sketches[i].to_bytes(states[i]) for i in got],
                }
            )

    # parallelism floor after the narrow projection (no-op at scale; see
    # session.ensure_min_partitions) — the "ONE scan" contract is about
    # scans of ``df``, which this does not add
    from ..session import ensure_min_partitions

    return ensure_min_partitions(src).mapInPandas(
        _fold, schema="name string, state binary"
    )


def profile(df, specs: list[SketchSpec]) -> dict[str, object]:
    """Build every spec's sketch state in ONE scan of ``df``.

    Merge topology mirrors ``MergeableSketch.build``: when the stage-1
    collect would be heavy (P partitions x total state bytes > ~64 MB), a
    salted ``groupBy(name, salt).applyInPandas`` pre-merge folds states
    distributed first (the shuffle carries states, not rows); the driver
    then folds the <= S x sqrt(P) survivors. Associativity makes the
    topology invisible in the result."""
    from pyspark.sql import functions as F

    specs = list(specs)
    parts = _stage1(df, specs)
    by_name = {s.name: s.sketch for s in specs}

    p = df.rdd.getNumPartitions()
    per_part = sum(
        (s.sketch.approx_state_bytes() or (1 << 20)) for s in specs
    )
    fan = math.isqrt(max(1, p))
    if p * per_part > (64 << 20) and fan > 1:

        def _pre_merge(pdf: pd.DataFrame) -> pd.DataFrame:
            nm = pdf["name"].iloc[0]
            sk = by_name[nm]
            state = None
            for b in pdf["state"]:
                s = sk.from_bytes(bytes(b))
                state = s if state is None else sk.merge(state, s)
            return pd.DataFrame({"name": [nm], "state": [sk.to_bytes(state)]})

        parts = (
            parts.withColumn(
                "salt", F.pmod(F.spark_partition_id(), F.lit(fan))
            )
            .groupBy("name", "salt")
            .applyInPandas(_pre_merge, schema="name string, state binary")
        )

    out: dict[str, object] = {}
    for row in parts.collect():
        nm = row["name"]
        sk = by_name[nm]
        st = sk.from_bytes(bytes(row["state"]))
        out[nm] = st if nm not in out else sk.merge(out[nm], st)
    for s in specs:  # empty input: every sketch still yields a state
        if s.name not in out:
            out[s.name] = s.sketch.new_state()
    return out


def _stage1_by_key(df, keys: list[str], specs: list[SketchSpec]):
    """Grouped single-scan partial fold: DataFrame[keys... string, name
    string, state binary] — one row per (partition x key-tuple x spec).
    Key values are stringified exactly like ``MergeableSketch.partials``
    so the two families stay join-compatible."""
    from pyspark.sql import functions as F

    _validate(specs)
    if not keys:
        raise ValueError("profile_by_key needs at least one key column")
    clash = set(keys) & {s.name for s in specs}
    if clash:
        raise ValueError(f"spec names shadow key columns: {sorted(clash)}")
    proj: dict[tuple, str] = {}
    exprs = [F.col(k) for k in keys]
    spec_alias: list[str] = []
    for s in specs:
        if s.ngram is None:
            pk = ("scalar", s.col, s.sketch.input_kind)
            if pk not in proj:
                alias = f"__in_{len(proj)}"
                proj[pk] = alias
                exprs.append(s.sketch._input_expr(s.col, alias=alias))
        else:
            pk = ("array", s.col)
            if pk not in proj:
                alias = f"__arr_{len(proj)}"
                proj[pk] = alias
                exprs.append(F.col(s.col).alias(alias))
        spec_alias.append(proj[pk])

    from ..session import ensure_min_partitions

    src = ensure_min_partitions(df.select(*exprs))
    sketches = [s.sketch for s in specs]
    names = [s.name for s in specs]
    ngrams = [s.ngram for s in specs]
    key_list = list(keys)
    schema = (
        ", ".join(f"{k} string" for k in key_list)
        + ", name string, state binary"
    )

    # Bounded-memory grouped fold, shared with MergeableSketch.partials
    # (base._fold_cell/_emit_cell): elementwise-update specs buffer small
    # groups' raw inputs (capped at state_bytes/8 elems per group) and
    # materialize dense states one at a time at emit — otherwise peak
    # memory is #groups x #specs x state_bytes, which OOMs on group count
    # alone at high-cardinality keys. Bit-identical by batch-split
    # invariance (the per-sketch contract, tested).
    caps = [_buffer_cap(sk) for sk in sketches]

    def _fold(batches):
        acc: dict[tuple, list] = {}
        for pdf in batches:
            for kv, grp in pdf.groupby(key_list, sort=False, dropna=False):
                kt = kv if isinstance(kv, tuple) else (kv,)
                cells = acc.get(kt)
                if cells is None:
                    cells = [None] * len(specs)
                    acc[kt] = cells
                flat_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
                # hashes cached per (array column, n): specs sharing a
                # window feed hash ONCE per group-batch
                hash_cache: dict[tuple[str, int], np.ndarray] = {}
                for i, sk in enumerate(sketches):
                    if ngrams[i] is None:
                        arr = grp[spec_alias[i]].to_numpy()
                        owned = False  # batch view: buffering must copy
                    else:
                        alias = spec_alias[i]
                        hkey = (alias, ngrams[i])
                        arr = hash_cache.get(hkey)
                        if arr is None:
                            if alias not in flat_cache:
                                flat_cache[alias] = _series_to_flat(grp[alias])
                            flat, lens = flat_cache[alias]
                            arr = _flat_ngram_hashes(
                                flat, lens, ngrams[i]
                            ).view(np.int64)
                            hash_cache[hkey] = arr
                        owned = True  # freshly built hash array
                    cells[i] = _fold_cell(sk, cells[i], arr, caps[i], owned)
        if acc:
            cols: dict[str, list] = {k: [] for k in key_list}
            cols["name"] = []
            cols["state"] = []
            for kt, cells in acc.items():
                for i, cur in enumerate(cells):
                    if cur is None:
                        continue
                    for j, k in enumerate(key_list):
                        cols[k].append(str(kt[j]))
                    cols["name"].append(names[i])
                    cols["state"].append(_emit_cell(sketches[i], cur))
            yield pd.DataFrame(cols)

    return src.mapInPandas(_fold, schema=schema)


def profile_by_key(df, keys, specs: list[SketchSpec]):
    """Per-group fused profile: every spec's merged state for every key
    group, from ONE scan of ``df`` — DataFrame[keys... string, name
    string, state binary].

    The grouped analogue of ``profile``: S calls to
    ``MergeableSketch.states_by_key`` pay S full table scans; this pays
    one. Stage 2 is a single ``groupBy(keys, name)`` whose shuffle
    carries (G x S x P') serialized states, never rows — at 10^12
    sequences the scan emits per-(partition x group x spec) states only,
    and the reduce output is G x S rows. Merge associativity makes the
    result value-identical to the per-sketch path (byte-identical for
    batch-order-insensitive states; tested)."""
    specs = list(specs)
    keys = list(keys)
    parts = _stage1_by_key(df, keys, specs)
    by_name = {s.name: s.sketch for s in specs}
    schema = (
        ", ".join(f"{k} string" for k in keys) + ", name string, state binary"
    )

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = by_name[pdf["name"].iloc[0]]
        state = None
        for b in pdf["state"]:
            s = sk.from_bytes(bytes(b))
            state = s if state is None else sk.merge(state, s)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["name"] = [pdf["name"].iloc[0]]
        out["state"] = [sk.to_bytes(state)]
        return pd.DataFrame(out)

    return parts.groupBy(*keys, "name").applyInPandas(_final, schema=schema)


def profile_estimates_by_key(df, keys, specs: list[SketchSpec]):
    """Per-group scalar estimates for every spec from ONE scan:
    DataFrame[keys... string, <spec.name> double ...] — one output row
    per key group, one column per spec (names must be valid column
    names). Stage 2 groups by keys only, so each group's S states merge
    and estimate inside a single task. Specs whose sketch has no scalar
    ``estimate`` (e.g. Bloom) are rejected — fetch their states via
    ``profile_by_key``."""
    specs = list(specs)
    keys = list(keys)
    for s in specs:
        if type(s.sketch).estimate is MergeableSketch.estimate:
            raise ValueError(
                f"spec {s.name!r}: {type(s.sketch).__name__} has no scalar"
                f" estimate — use profile_by_key for raw states"
            )
    parts = _stage1_by_key(df, keys, specs)
    by_name = {s.name: s.sketch for s in specs}
    names = [s.name for s in specs]
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", "
        + ", ".join(f"{n} double" for n in names)
    )

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [pdf[k].iloc[0]] for k in keys}
        for nm in names:
            sk = by_name[nm]
            state = sk.new_state()
            for b in pdf.loc[pdf["name"] == nm, "state"]:
                state = sk.merge(state, sk.from_bytes(bytes(b)))
            out[nm] = [float(sk.estimate(state))]
        return pd.DataFrame(out)

    return parts.groupBy(*keys).applyInPandas(_final, schema=schema)


def heavy_ngrams(df, col: str, n: int, k: int = 4096, top: int = 100):
    """Heaviest token n-grams of a corpus WITHOUT exploding rows:
    DataFrame[gram_hash long, gram array<int>, count_est long,
    max_undercount long], heaviest first.

    At 10^12 sequences x ~500 tokens a naive ``posexplode + groupBy``
    heavy-hitter query shuffles ~5x10^14 gram rows. This runs in two
    scans and shuffles only k-entry states:

      1. a Misra-Gries sketch folds every n-token window hash per
         partition (``MisraGries.build(..., ngram=n)`` — the gram hashes
         ARE the MG items); the merged state certifies, for every gram,
         ``count_est <= true <= count_est + max_undercount`` with
         ``max_undercount <= total_windows / (k + 1)``, and retains any
         gram whose true count exceeds that bound;
      2. a resolve scan maps the top retained hashes back to actual
         token grams (broadcast hash set, windows sliced from the flat
         token buffer in-kernel) — no token array ever visits the driver.

    ``gram_hash`` is the shared window-hash contract
    (``token_ngram_hashes``), so rows can be cross-checked against CMS
    point queries over the same column. Choose ``k`` >> the expected
    number of interesting grams: the bound tightens as 1/(k+1).
    Deterministic given the input (MG retained sets depend on merge
    order only through the bound, which is reported per call)."""
    from pyspark.sql import functions as F

    from .mg import MisraGries

    mg = MisraGries(k)
    state = mg.build(df, col, ngram=n)
    items = mg.top_items(state, top)
    spark = df.sparkSession
    if not items:
        return spark.createDataFrame(
            [], "gram_hash long, gram array<int>, count_est long,"
            " max_undercount long"
        )
    top_sorted = np.sort(np.array([int(h) for h, _ in items], dtype=np.int64))
    dec = int(mg.error_bound(state))
    resolved = _resolve_gram_hashes(df, col, n, top_sorted)
    counts = spark.createDataFrame(
        [(int(h), int(c)) for h, c in items], "gram_hash long, count_est long"
    )
    return (
        resolved.join(F.broadcast(counts), "gram_hash")
        .withColumn("max_undercount", F.lit(dec).cast("long"))
        .orderBy(F.desc("count_est"), "gram_hash")
    )


def _resolve_gram_hashes(df, col: str, n: int, top_sorted: np.ndarray):
    """One resolve scan: map a sorted int64 gram-hash set back to actual
    token grams — DataFrame[gram_hash long, gram array<int>]. Windows are
    sliced from the flat in-kernel token buffer; no token array visits
    the driver. Gram bytes are key-independent, so per-key callers
    resolve the UNION of their keys' hashes in this same single scan."""
    from pyspark.sql import functions as F

    def _resolve(batches):
        for pdf in batches:
            flat, lens = _series_to_flat(pdf["__arr"])
            h, pos = _flat_ngram_hashes_pos(flat, lens, n)
            hs = h.view(np.int64)
            if len(hs) == 0:
                continue
            idx = np.searchsorted(top_sorted, hs)
            idx[idx == len(top_sorted)] = 0
            hit = top_sorted[idx] == hs
            if not hit.any():
                continue
            hh, pp = hs[hit], pos[hit]
            uh, first = np.unique(hh, return_index=True)
            grams = [
                flat[p : p + n].astype(np.int32).tolist() for p in pp[first]
            ]
            yield pd.DataFrame({"gram_hash": uh, "gram": grams})

    from ..session import ensure_min_partitions

    return (
        ensure_min_partitions(df.select(F.col(col).alias("__arr")))
        .mapInPandas(_resolve, schema="gram_hash long, gram array<int>")
        .dropDuplicates(["gram_hash"])  # grams agree per 64-bit hash
    )


def heavy_ngrams_by_key(df, col: str, n: int, keys, k: int = 4096,
                        top: int = 100):
    """Per-group heaviest token n-grams — DataFrame[keys... string,
    gram_hash long, gram array<int>, count_est long, max_undercount
    long], heaviest first within each group.

    Same two-scan shape as ``heavy_ngrams`` (per-domain boilerplate /
    contamination analysis without exploding 10^14 gram rows): scan 1 is
    ONE ``states_by_key`` pass folding every group's Misra-Gries state
    (states-not-rows shuffle); the per-group top hashes are unioned and
    scan 2 resolves them to grams ONCE for all groups. The driver holds
    G x k MG entries (~64 KB/group at k=4096) — bucket or filter first
    if G runs to millions. Each group's ``max_undercount`` is its own
    certified MG bound."""
    from .mg import MisraGries

    keys = list(keys)  # states_by_key would consume a one-shot iterable
    mg = MisraGries(k)
    state_rows = mg.states_by_key(df, col, keys, ngram=n).collect()
    return heavy_ngrams_from_states(df, col, n, state_rows, keys, mg, top)


def heavy_ngrams_from_states(resolve_df, col: str, n: int, state_rows,
                             keys, mg, top: int = 100):
    """Resolve per-key heavy n-grams from ALREADY-FOLDED Misra-Gries
    state rows (collected ``[keys..., state binary]`` rows, one per
    group) — the shared tail of ``heavy_ngrams_by_key`` and
    ``IncrementalProfile.heavy_ngrams``: union the per-key top hashes,
    ONE resolve scan over ``resolve_df`` maps them back to token grams,
    broadcast-join counts to grams. ``resolve_df`` must cover the data
    the states were folded from (a retained hash resolves only if its
    gram occurs in the scan). Same output contract as
    ``heavy_ngrams_by_key``."""
    from pyspark.sql import functions as F

    keys = list(keys)
    spark = resolve_df.sparkSession
    count_rows = []
    all_hashes: set[int] = set()
    for r in state_rows:
        st = mg.from_bytes(bytes(r["state"]))
        dec = int(mg.error_bound(st))
        for h, c in mg.top_items(st, top):
            count_rows.append(
                tuple(r[kk] for kk in keys) + (int(h), int(c), dec)
            )
            all_hashes.add(int(h))
    schema = (
        ", ".join(f"{kk} string" for kk in keys)
        + ", gram_hash long, count_est long, max_undercount long"
    )
    if not count_rows:
        return spark.createDataFrame(
            [], schema + ", gram array<int>"
        ).select(
            *keys, "gram_hash", "gram", "count_est", "max_undercount"
        )
    top_sorted = np.sort(np.fromiter(all_hashes, dtype=np.int64))
    resolved = _resolve_gram_hashes(resolve_df, col, n, top_sorted)
    counts = spark.createDataFrame(count_rows, schema)
    return (
        counts.join(F.broadcast(resolved), "gram_hash")
        .select(*keys, "gram_hash", "gram", "count_est", "max_undercount")
        .orderBy(*keys, F.desc("count_est"), "gram_hash")
    )


def profile_estimates(df, specs: list[SketchSpec]) -> dict[str, float]:
    """``profile`` + per-spec scalar ``estimate()`` (sketches without an
    estimate — e.g. Bloom — are omitted; fetch their state via
    ``profile`` directly)."""
    states = profile(df, specs)
    out: dict[str, float] = {}
    for s in specs:
        try:
            out[s.name] = float(s.sketch.estimate(states[s.name]))
        except NotImplementedError:
            pass
    return out
