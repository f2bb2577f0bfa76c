"""Gopher repetition filtering (Rae et al. 2021, appendix A1.1, the
"repetition removal" half): duplicate-line / duplicate-paragraph
fractions and repeated word-n-gram character fractions, plus the
published thresholds as exact integer-arithmetic flags.

Everything is DOC-LOCAL, so the whole operator is one scan with zero
shuffle at any corpus size: a single Arrow-batched pandas UDF computes
the integer signals with vectorized numpy across the batch (the only
per-doc Python is the ``str.split`` object work, same inherent cost the
shingle kernels carry — see ``pipeline/dedup.py``), and the threshold
flags are plain Column expressions over those integers.

Exact-reproducibility contract (what the DuckDB oracle restates):

- words = single-space split, lines = ``\\n`` split, paragraphs =
  ``\\n\\n`` split (empty string splits to ``['']``, i.e. 1 element).
- ``dup_elems(L)  = len(L) - len(distinct(L))``
- ``dup_chars(L)  = sum(len(x) for x in L) - sum(len(x) for x in distinct(L))``
  (each occurrence beyond the first contributes its length — the
  identity avoids any per-value grouping on both sides).
- word n-grams are the ``len(words)-n+1`` sliding windows joined by a
  single space; their char length is ``sum(word lens) + (n-1)``.
- top-n-gram signals consider only grams occurring >= 2 times (a phrase
  seen once is not repetition): ``top{n}_cnt`` = the max count among
  those (0 if none), ``top{n}_len`` = the max char length among grams
  achieving that count (deterministic without naming the gram, so ties
  never matter).
- every fraction threshold is integer cross-multiplication against
  ``n_chars = len(text)`` — no floats anywhere.

Thresholds are the published Gopher table values. Reference framing
only — minperf has no text pipeline; this belongs to the LLM-data ops
the task brief adds on top of the reference surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: (numerator, denominator) of each max allowed fraction — Rae et al.
#: 2021 table A1. Key -> threshold num/den (e.g. top_2gram: 0.20 = 1/5).
GOPHER_REP_THRESHOLDS: dict[str, tuple[int, int]] = {
    "dup_line_frac": (3, 10),
    "dup_para_frac": (3, 10),
    "dup_line_char_frac": (1, 5),
    "dup_para_char_frac": (1, 5),
    "top_2gram_char_frac": (1, 5),
    "top_3gram_char_frac": (9, 50),
    "top_4gram_char_frac": (4, 25),
    "dup_5gram_char_frac": (3, 20),
    "dup_6gram_char_frac": (7, 50),
    "dup_7gram_char_frac": (13, 100),
    "dup_8gram_char_frac": (3, 25),
    "dup_9gram_char_frac": (11, 100),
    "dup_10gram_char_frac": (1, 10),
}

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)


def _flatten_str_lists(lists) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(codes, char_lens, doc_lens) of a list-of-string-lists: values are
    factorized batch-wide so all per-value work downstream is integer."""
    lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    flat = pd.Series(
        [v for x in lists for v in x] if len(lists) else [], dtype=object
    )
    codes, uniques = pd.factorize(flat)
    # char length per element, via the unique table (one str len pass
    # over distinct values, gathered back by code)
    ulen = np.fromiter((len(u) for u in uniques), dtype=np.int64, count=len(uniques))
    clens = ulen[codes] if len(codes) else np.empty(0, np.int64)
    return codes.astype(np.int64), clens, lens


def _dup_stats(codes, clens, doc_lens) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (dup_elems, dup_chars) using the total-minus-distinct
    identity; distinct detection is one lexsort over (doc, code)."""
    n_docs = len(doc_lens)
    if codes.size == 0:
        z = np.zeros(n_docs, np.int64)
        return z, z.copy()
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
    order = np.lexsort((codes, doc_of))
    sd, sc, sl = doc_of[order], codes[order], clens[order]
    first = np.ones(len(sd), dtype=bool)
    first[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
    tot_e = np.bincount(doc_of, minlength=n_docs)
    dis_e = np.bincount(sd[first], minlength=n_docs)
    tot_c = np.bincount(doc_of, weights=clens, minlength=n_docs)
    dis_c = np.bincount(sd[first], weights=sl[first], minlength=n_docs)
    return (tot_e - dis_e).astype(np.int64), np.rint(tot_c - dis_c).astype(np.int64)


def _window_runs(word_codes, word_clens, doc_lens, n):
    """Group the n-word windows of every doc by (doc, window value):
    returns per-run (doc, count, window char len) plus each doc's run
    segment. Window identity is the shared 64-bit polynomial window hash
    (``sketches.multi._flat_ngram_hashes_pos``) over the factorized word
    codes — exact up to 64-bit collisions inside one doc."""
    from ..sketches.multi import _flat_ngram_hashes_pos

    n_docs = len(doc_lens)
    h, pos = _flat_ngram_hashes_pos(word_codes.astype(np.uint64), doc_lens, n)
    n_win = np.maximum(doc_lens - n + 1, 0)
    if h.size == 0:
        e = np.empty(0, np.int64)
        return e, e, e, n_win
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
    cs = np.concatenate([[0], np.cumsum(word_clens)])
    wlen = cs[pos + n] - cs[pos] + (n - 1)  # joined-by-space char length
    order = np.lexsort((h, doc_of))
    sd, sh = doc_of[order], h[order]
    first = np.ones(len(sd), dtype=bool)
    first[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
    run_id = np.cumsum(first) - 1
    run_cnt = np.bincount(run_id)
    run_doc = sd[first]
    run_len = wlen[order][first]
    return run_doc, run_cnt.astype(np.int64), run_len, n_win


def _per_doc_max(values, run_doc, n_docs) -> np.ndarray:
    """max(values) per doc over run rows (0 for docs with no rows)."""
    out = np.zeros(n_docs, np.int64)
    if values.size:
        np.maximum.at(out, run_doc, values)
    return out


def rep_signal_fields() -> list[str]:
    fields = ["n_lines", "dup_lines", "dup_line_chars",
              "n_paras", "dup_paras", "dup_para_chars"]
    for n in _TOP_NS:
        fields += [f"top{n}_cnt", f"top{n}_len"]
    for n in _DUP_NS:
        fields.append(f"dup{n}_chars")
    return fields


def _rep_signals_batch(texts: pd.Series) -> pd.DataFrame:
    """The batch kernel: every signal for every doc, vectorized numpy
    after the inherent str.split object pass. None -> ''."""
    t = texts.fillna("")
    out: dict[str, np.ndarray] = {}
    for name, sep in (("line", "\n"), ("para", "\n\n")):
        parts = t.str.split(sep, regex=False)
        codes, clens, dlens = _flatten_str_lists(parts.tolist())
        d_e, d_c = _dup_stats(codes, clens, dlens)
        out[f"n_{name}s"] = dlens
        out[f"dup_{name}s"] = d_e
        out[f"dup_{name}_chars"] = d_c
    wcodes, wclens, wlens = _flatten_str_lists(t.str.split(" ", regex=False).tolist())
    n_docs = len(t)
    for n in _TOP_NS:
        run_doc, run_cnt, run_len, _ = _window_runs(wcodes, wclens, wlens, n)
        rep = run_cnt >= 2
        top_cnt = _per_doc_max(run_cnt[rep], run_doc[rep], n_docs)
        at_top = rep & (run_cnt == top_cnt[run_doc])
        out[f"top{n}_cnt"] = top_cnt
        out[f"top{n}_len"] = _per_doc_max(run_len[at_top], run_doc[at_top], n_docs)
    for n in _DUP_NS:
        run_doc, run_cnt, run_len, _ = _window_runs(wcodes, wclens, wlens, n)
        dup = np.zeros(n_docs, np.int64)
        if run_cnt.size:
            np.add.at(dup, run_doc, (run_cnt - 1) * run_len)
        out[f"dup{n}_chars"] = dup
    return pd.DataFrame({f: out[f] for f in rep_signal_fields()})


def with_repetition_signals(df, text_col: str):
    """Append every repetition signal (integers) plus one boolean flag
    per Gopher threshold (``f_<key>``; true = within bound) and
    ``rep_pass`` = all bounds hold. One scan, one Arrow-batched UDF."""
    import pyspark.sql.functions as F

    schema = ", ".join(f"{f} long" for f in rep_signal_fields())

    @F.pandas_udf(schema)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        return _rep_signals_batch(texts)

    out = df.withColumn("_rep", _rep(F.col(text_col)))
    for f in rep_signal_fields():
        out = out.withColumn(f, F.col("_rep")[f])
    out = out.drop("_rep").withColumn("n_chars", F.length(F.col(text_col)))
    c = F.col
    nc = c("n_chars")
    frac = {  # signal-expression per threshold key: (value, base)
        "dup_line_frac": (c("dup_lines"), c("n_lines")),
        "dup_para_frac": (c("dup_paras"), c("n_paras")),
        "dup_line_char_frac": (c("dup_line_chars"), nc),
        "dup_para_char_frac": (c("dup_para_chars"), nc),
        **{f"top_{n}gram_char_frac": (c(f"top{n}_cnt") * c(f"top{n}_len"), nc)
           for n in _TOP_NS},
        **{f"dup_{n}gram_char_frac": (c(f"dup{n}_chars"), nc)
           for n in _DUP_NS},
    }
    flags = []
    for key, (num, den) in GOPHER_REP_THRESHOLDS.items():
        val, base = frac[key]
        flag = f"f_{key}"
        out = out.withColumn(flag, F.lit(den) * val <= F.lit(num) * base)
        flags.append(flag)
    pass_col = flags[0]
    expr = F.col(pass_col)
    for f in flags[1:]:
        expr = expr & F.col(f)
    return out.withColumn("rep_pass", expr)


def gopher_repetition_filter(df, text_col: str):
    """Keep only documents within every repetition bound; returns
    ``df``'s columns unchanged — names AND values (an input column
    colliding with a signal name, ``n_chars`` above all, is protected
    rather than silently replaced by the recomputed signal)."""
    import pyspark.sql.functions as F

    from .text import _rename_aside, _restore_aside

    sig = [
        c
        for c in with_repetition_signals(
            df.select(text_col).limit(0), text_col
        ).columns
        if c != text_col
    ]
    work, collide = _rename_aside(df, sig)
    out = (
        with_repetition_signals(work, text_col)
        .filter(F.col("rep_pass"))
        .drop(*sig)
    )
    return _restore_aside(out, collide).select(*df.columns)
