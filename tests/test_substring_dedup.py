"""Exact substring dedup (pipeline/substring_dedup) vs a brute-force
token-tuple reference — the Spark path works on 128-bit window-hash
pairs, the reference on the actual token tuples, so agreement checks the
whole hash/locate/rank/cut chain end-to-end."""

import numpy as np
import pytest

from recsplit_spark.pipeline.substring_dedup import (
    dedup_substrings,
    duplicate_spans,
    duplicate_windows,
)


def _ref_dedup(docs, n, keep="first"):
    """Brute force on token tuples. ``docs``: {doc_id: list[int]} with
    ids whose python sort order matches Spark's string sort."""
    occ = {}
    for did in sorted(docs):
        toks = docs[did]
        for p in range(len(toks) - n + 1):
            occ.setdefault(tuple(toks[p : p + n]), []).append((did, p))
    cuts = {}
    for occs in occ.values():
        if len(occs) < 2:
            continue
        occs = sorted(occs)
        drop = occs[1:] if keep == "first" else occs
        for did, p in drop:
            cuts.setdefault(did, []).append(p)
    out, removed = {}, {}
    for did, toks in docs.items():
        mask = [True] * len(toks)
        for p in cuts.get(did, []):
            for j in range(p, min(p + n, len(toks))):
                mask[j] = False
        kept = [t for t, m in zip(toks, mask) if m]
        out[did] = kept
        removed[did] = len(toks) - len(kept)
    return out, removed, cuts


def _to_df(spark, docs):
    rows = [(did, list(map(int, toks))) for did, toks in sorted(docs.items())]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def _run_and_compare(spark, docs, n, keep="first", waves=1):
    df = _to_df(spark, docs).cache()
    got = {
        r["doc_id"]: (list(r["tokens"]), r["removed_tok"])
        for r in dedup_substrings(
            df, "doc_id", "tokens", n=n, keep=keep, waves=waves
        ).collect()
    }
    df.unpersist()
    exp_toks, exp_removed, _ = _ref_dedup(docs, n, keep)
    assert set(got) == set(docs)
    for did in docs:
        assert got[did][0] == exp_toks[did], did
        assert got[did][1] == exp_removed[did], did


def test_shared_span_cut_keeps_first(spark):
    span = list(range(900, 912))  # 12 tokens, n=8 -> 5 windows, union 12
    docs = {
        "d0": [1, 2, 3, 4] + span + [5, 6, 7, 8],  # keeper (min doc_id)
        "d1": [9, 10] + span + [11, 12, 13, 14, 15, 16],
        "d2": span + [17, 18, 19, 20, 21, 22, 23, 24],
        "d3": [25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36],  # clean
    }
    _run_and_compare(spark, docs, n=8)


def test_within_doc_repeat_and_overlap(spark):
    span = list(range(700, 710))
    docs = {
        # the same 10-gram twice in one doc (second occurrence cut),
        # with filler shorter than n between them
        "d0": span + [1, 2, 3] + span + [4, 5, 6, 7, 8, 9, 10, 11],
        # overlapping duplicated windows from a 2x-long planted region
        "d1": span + span + [12, 13, 14, 15, 16, 17, 18, 19],
    }
    _run_and_compare(spark, docs, n=8)


def test_short_docs_and_no_dups_unchanged(spark):
    docs = {
        "d0": [1, 2, 3],  # shorter than n: no windows
        "d1": list(range(10, 30)),
        "d2": list(range(50, 75)),
    }
    df = _to_df(spark, docs)
    assert duplicate_windows(df, "tokens", n=8).count() == 0
    out = {
        r["doc_id"]: (list(r["tokens"]), r["removed_tok"])
        for r in dedup_substrings(df, n=8).collect()
    }
    for did, toks in docs.items():
        assert out[did] == (toks, 0)


def test_keep_none_cuts_all_occurrences(spark):
    span = list(range(800, 810))
    docs = {
        "d0": span + [1, 2, 3, 4, 5, 6, 7, 8],
        "d1": [9, 10, 11, 12] + span + [13, 14, 15, 16],
    }
    _run_and_compare(spark, docs, n=10, keep="none")


def test_randomized_against_reference_and_waves(spark):
    rng = np.random.default_rng(42)
    n = 5
    docs = {}
    for i in range(80):
        ln = int(rng.integers(3, 60))
        docs[f"d{i:03d}"] = rng.integers(0, 1000, size=ln).tolist()
    # plant a shared span into every 4th doc and a within-doc repeat
    span = rng.integers(2000, 3000, size=9).tolist()
    for i in range(0, 80, 4):
        d = docs[f"d{i:03d}"]
        at = int(rng.integers(0, len(d) + 1))
        docs[f"d{i:03d}"] = d[:at] + span + d[at:]
    docs["d001"] = docs["d001"] + span + [1, 2] + span
    _run_and_compare(spark, docs, n=n, waves=1)
    _run_and_compare(spark, docs, n=n, waves=3)


def test_duplicate_spans_relation_matches_reference(spark):
    span = list(range(600, 612))
    docs = {
        "d0": [1, 2] + span + [3, 4, 5, 6, 7, 8],
        "d1": span + [9, 10, 11, 12, 13, 14, 15, 16],
        "d2": [17, 18, 19, 20] + span,
    }
    df = _to_df(spark, docs)
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicate_spans(df, n=8).collect()
    }
    _, _, cuts = _ref_dedup(docs, 8)
    exp = {(did, p) for did, ps in cuts.items() for p in ps}
    assert got == exp


def test_len_col_refresh_and_removed_guard(spark):
    span = list(range(500, 510))
    docs = {
        "d0": span + [1, 2, 3, 4, 5, 6, 7, 8],
        "d1": [9, 10] + span + [11, 12, 13, 14, 15, 16],
    }
    import pyspark.sql.functions as F

    df = _to_df(spark, docs).withColumn("n_tok", F.size("tokens"))
    out = dedup_substrings(df, n=10, len_col="n_tok")
    for r in out.collect():
        assert r["n_tok"] == len(r["tokens"])
        assert r["removed_tok"] + r["n_tok"] == len(docs[r["doc_id"]])
    with pytest.raises(ValueError, match="removed_tok"):
        dedup_substrings(out, n=10)


def test_surviving_occurrence_postcondition(spark):
    """keep='first': of each duplicated window's original occurrences at
    most one survives the cut (exactly one unless another window's span
    covered the keeper)."""
    rng = np.random.default_rng(7)
    n = 5
    docs = {}
    for i in range(40):
        docs[f"d{i:03d}"] = rng.integers(0, 300, size=int(rng.integers(5, 40))).tolist()
    span = rng.integers(5000, 6000, size=8).tolist()
    for i in range(0, 40, 3):
        docs[f"d{i:03d}"] += span
    exp_toks, _, cuts = _ref_dedup(docs, n)
    # recount survivors per duplicated window on ORIGINAL positions
    occ = {}
    for did in sorted(docs):
        toks = docs[did]
        for p in range(len(toks) - n + 1):
            occ.setdefault(tuple(toks[p : p + n]), []).append((did, p))
    covered = {
        did: {
            j
            for p in ps
            for j in range(p, min(p + n, len(docs[did])))
        }
        for did, ps in cuts.items()
    }
    for gram, occs in occ.items():
        if len(occs) < 2:
            continue
        survive = [
            (did, p)
            for did, p in occs
            if not any(j in covered.get(did, set()) for j in range(p, p + n))
        ]
        assert len(survive) <= 1
    # and the Spark output equals that reference exactly
    _run_and_compare(spark, docs, n=n)


def test_spilled_locate_path_matches_reference(spark, tmp_path, monkeypatch):
    """Above driver_cap the duplicated-window set must never be gathered
    whole: D spills to parquet, each wave loads only its hash slice.
    toPandas is patched to raise on any over-cap gather, and the output
    must still equal the brute-force reference (and hence the in-memory
    path, which the other tests pin to the same reference)."""
    rng = np.random.default_rng(3)
    n = 5
    docs = {
        f"d{i:03d}": rng.integers(0, 500, size=int(rng.integers(10, 40))).tolist()
        for i in range(30)
    }
    span = rng.integers(7000, 8000, size=24).tolist()  # 20 dup windows at n=5
    for i in range(0, 30, 2):
        d = docs[f"d{i:03d}"]
        at = int(rng.integers(0, len(d) + 1))
        docs[f"d{i:03d}"] = d[:at] + span + d[at:]
    docs["d001"] = docs["d001"] + span[:10]  # extra cross-doc dup region
    df = _to_df(spark, docs).cache()
    n_dups = duplicate_windows(df, "tokens", n=n).count()
    cap = 4
    assert n_dups > 3 * cap  # the whole-set gather WOULD trip the patch
    cls = type(df)
    orig = cls.toPandas
    gathers = []

    def capped(self):
        out = orig(self)
        gathers.append(len(out))
        if len(out) > 3 * cap:  # slack: pmod slices are uniform, not exact
            raise AssertionError(f"driver gather of {len(out)} rows")
        return out

    monkeypatch.setattr(cls, "toPandas", capped)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["removed_tok"])
        for r in dedup_substrings(
            df, n=n, driver_cap=cap, spill_dir=str(tmp_path / "spill")
        ).collect()
    }
    monkeypatch.undo()
    df.unpersist()
    exp_toks, exp_removed, _ = _ref_dedup(docs, n)
    for did in docs:
        assert got[did] == (exp_toks[did], exp_removed[did]), did
    assert (tmp_path / "spill" / "dups").exists()
    assert (tmp_path / "spill" / "occ").exists()
    assert gathers and max(gathers) <= 3 * cap


def test_spill_dir_reuse_is_clean(spark, tmp_path):
    """A reused spill_dir must NOT mix stale occurrence rows from an
    earlier call into the read-back (ADVICE r5, medium): the occ dir is
    cleared before the wave loop, so a second dedup_substrings over a
    DIFFERENT corpus through the same dir equals a fresh-dir run."""
    rng = np.random.default_rng(11)
    n = 5

    def corpus(salt):
        docs = {
            f"d{i:03d}": rng.integers(0, 400, size=30).tolist()
            for i in range(20)
        }
        span = [9000 + salt * 50 + j for j in range(12)]
        for i in range(0, 20, 2):
            docs[f"d{i:03d}"] = docs[f"d{i:03d}"] + span
        return docs

    spill = str(tmp_path / "spill")
    docs_a, docs_b = corpus(1), corpus(2)
    df_a, df_b = _to_df(spark, docs_a).cache(), _to_df(spark, docs_b).cache()
    run = lambda df: {
        r["doc_id"]: (list(r["tokens"]), r["removed_tok"])
        for r in dedup_substrings(
            df, n=n, driver_cap=4, spill_dir=spill
        ).collect()
    }
    run(df_a)  # pollute the spill dir with corpus A's occurrences
    got_b = run(df_b)
    fresh_b = {
        r["doc_id"]: (list(r["tokens"]), r["removed_tok"])
        for r in dedup_substrings(
            df_b, n=n, driver_cap=4, spill_dir=str(tmp_path / "fresh")
        ).collect()
    }
    df_a.unpersist(); df_b.unpersist()
    assert got_b == fresh_b


def test_hot_window_straggler_guard(spark):
    """One window duplicated 10^4 times (the LSH hot-bucket test's
    shape): keep='first' must complete via the min-struct aggregation —
    partial aggregation collapses the hot window map-side — and keep
    exactly the lexicographically-first occurrence."""
    n = 5
    span = [7000 + j for j in range(n)]
    docs = {f"d{i:05d}": list(span) for i in range(10_000)}
    docs["d00000"] = [1, 2, 3] + span  # keeper doc, window at pos 3
    df = _to_df(spark, docs)
    spans = duplicate_spans(df, n=n, keep="first")
    rows = spans.collect()
    cut = {(r["doc_id"], r["pos"]) for r in rows}
    assert ("d00000", 3) not in cut  # lexicographic first survives
    assert len(cut) == 10_000 - 1
    assert all(p == 0 for d, p in cut if d != "d00000")


def test_cut_spans_preserves_bigint_tokens(spark):
    """The declared output element type drives the kernel dtype — a
    bigint token >= 2^31 must round-trip, not wrap (int32 regression)."""
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.substring_dedup import cut_spans

    big = 5_000_000_000
    df = spark.createDataFrame(
        [("a", [big, 1, 2, 3]), ("b", [4, 5, 6, 7])],
        "doc_id string, tokens array<bigint>",
    )
    spans = spark.createDataFrame([("b", 1)], "doc_id string, pos long")
    out = {r["doc_id"]: r for r in cut_spans(df, spans, n=2).collect()}
    assert list(out["a"]["tokens"]) == [big, 1, 2, 3]
    assert list(out["b"]["tokens"]) == [4, 7]
    with pytest.raises(ValueError, match="integer array"):
        cut_spans(
            spark.createDataFrame(
                [("a", [1.5])], "doc_id string, tokens array<double>"
            ),
            spans,
        )
