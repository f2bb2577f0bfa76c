"""Text-analysis operators (training-data pipeline): token counting,
quality scoring, language ID, document fingerprinting.

Everything here is built-in Column expressions (JVM, whole-stage codegen) —
no Python in the hot path. Language ID is a stopword-ratio heuristic over a
small inlined lexicon (the classic n-gram/stopword trick; a real model would
be a Pandas UDF over a broadcast table — same plumbing).
"""

from __future__ import annotations

# minimal function-word lexicons (public knowledge) for the 5 fixture langs
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "en"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "von", "zu", "mit"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "们"],
}


def with_token_count(df, text_col: str, out_col: str = "n_tokens"):
    """Whitespace token count (split on single spaces, JVM-side)."""
    from pyspark.sql import functions as F

    return df.withColumn(out_col, F.size(F.split(F.col(text_col), " ")))


#: GPT-2-style pre-tokenizer pattern, restricted to constructs BOTH Java
#: regex (Spark) and RE2 (DuckDB oracle) support — i.e. no lookahead:
#: optional-leading-space letter runs / digit runs / punctuation runs,
#: plus standalone whitespace runs
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def with_token_count_bpe(df, text_col: str, out_col: str = "n_bpe_tokens"):
    """Token count under a BPE-ish pre-tokenizer regex (the
    whitespace-split count in ``with_token_count`` underestimates for
    punctuation-adjacent text; this matches how byte-pair encoders chunk
    before merging). Pure Column expr (regexp_count, JVM codegen)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        out_col, F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
    )


def with_quality_counts(df, text_col: str):
    """Integer quality signals (exactly SQL-reproducible): n_chars,
    n_tokens, punct_count, digit_count, upper_count."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    return (
        df.withColumn("n_chars", F.length(t))
        .withColumn("n_tokens", F.size(F.split(t, " ")))
        .withColumn(
            "punct_count",
            F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", "")),
        )
        .withColumn("digit_count", F.length(F.regexp_replace(t, r"[^0-9]", "")))
        .withColumn("upper_count", F.length(F.regexp_replace(t, r"[^A-Z]", "")))
    )


def with_quality_stats(df, text_col: str):
    """Length / punctuation / word-shape quality signals as columns:
    n_chars, n_tokens, avg_token_len, punct_ratio, digit_ratio,
    upper_ratio, stop_ratio_en."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(t, " ")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            (n_chars - n_tok + 1) / F.greatest(n_tok, F.lit(1)),
        )
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
            / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn(
            "digit_ratio",
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn(
            "upper_ratio",
            F.length(F.regexp_replace(t, r"[^A-Z]", "")) / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn(
            "stop_ratio_en",
            F.size(F.array_intersect(toks, stop_arr)) / F.greatest(n_tok, F.lit(1)),
        )
    )


def with_lang_id(df, text_col: str, out_col: str = "lang_pred"):
    """Stopword-vote language ID over the inlined lexicons.

    Score per language = count of tokens in that language's stopword list
    (array_intersect is set-semantics: distinct matches); prediction =
    argmax, 'und' (undetermined) when no stopword hits at all.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.lower(F.col(text_col)), " ")
    scores = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in _STOPWORDS[lang]]))
        ).alias(f"score_{lang}")
        for lang in _STOPWORDS
    ]
    langs = list(_STOPWORDS)
    tmp = df.withColumns({f"__s_{l}": s for l, s in zip(langs, scores)})
    best = F.greatest(*[F.col(f"__s_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"__s_{l}") == best, F.lit(l))
    out = tmp.withColumn(out_col, pred)
    return out.drop(*[f"__s_{l}" for l in langs])


#: two-or-more of these must appear for the Gopher stopword rule —
#: the published list (Rae et al. 2021, appendix A1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def with_gopher_quality(
    df,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
):
    """The Gopher document-quality rules (Rae et al. 2021, appendix
    A1.1) as pure Column expressions — one boolean per rule plus the
    integer signals behind it, and ``gopher_pass`` = every rule holds:

    - ``f_words``:    min_words <= word count <= max_words
    - ``f_mean_len``: mean word length in [3, 10]
    - ``f_symbol``:   (# + ellipsis) to word ratio <= 0.1
    - ``f_bullet``:   <= 90% of lines start with a bullet
    - ``f_ellipsis``: <= 30% of lines end with an ellipsis
    - ``f_alpha``:    >= 80% of words contain an alphabetic character
    - ``f_stop``:     >= 2 distinct Gopher stopwords present

    Every ratio test is integer cross-multiplication (e.g.
    ``10 * symbols <= words``), so the flags are EXACTLY reproducible
    in any SQL engine — no float thresholds. Words are single-space
    splits (the module's convention); lines split on newline. Zero
    Python: everything is JVM whole-stage codegen, one scan."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    # sum of word lengths = chars minus the (n_words - 1) separators
    sum_word_chars = F.length(t) - (n_words - F.lit(1))
    n_symbols = (
        F.length(F.regexp_replace(t, r"[^#]", ""))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    )
    n_bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    )
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.transform(words, F.lower), stop_arr)
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("n_lines", n_lines)
        .withColumn("sum_word_chars", sum_word_chars)
        .withColumn("n_symbols", n_symbols)
        .withColumn("n_bullet_lines", n_bullet_lines)
        .withColumn("n_ellipsis_lines", n_ellipsis_lines)
        .withColumn("n_alpha_words", n_alpha_words)
        .withColumn("n_stopwords", n_stop)
    )
    w, sc = F.col("n_words"), F.col("sum_word_chars")
    return (
        out.withColumn(
            "f_words", (w >= min_words) & (w <= max_words)
        )
        .withColumn(
            "f_mean_len",
            (F.lit(3) * w <= sc) & (sc <= F.lit(10) * w),
        )
        .withColumn("f_symbol", F.lit(10) * F.col("n_symbols") <= w)
        .withColumn(
            "f_bullet",
            F.lit(10) * F.col("n_bullet_lines")
            <= F.lit(9) * F.col("n_lines"),
        )
        .withColumn(
            "f_ellipsis",
            F.lit(10) * F.col("n_ellipsis_lines")
            <= F.lit(3) * F.col("n_lines"),
        )
        .withColumn(
            "f_alpha", F.lit(5) * F.col("n_alpha_words") >= F.lit(4) * w
        )
        .withColumn("f_stop", F.col("n_stopwords") >= 2)
        .withColumn(
            "gopher_pass",
            F.col("f_words")
            & F.col("f_mean_len")
            & F.col("f_symbol")
            & F.col("f_bullet")
            & F.col("f_ellipsis")
            & F.col("f_alpha")
            & F.col("f_stop"),
        )
    )


def _rename_aside(df, sig_cols):
    """(renamed_df, renames): rename input columns that collide with the
    signal names aside BEFORE a signal builder runs — the builders
    ``withColumn``-replace fixed stat names (``n_chars`` on the
    documents tables, e.g.), so without this a ``*_filter`` wrapper
    would silently return recomputed values in place of user data.
    The aside name is underscore-prefixed until it is absent from the
    frame (a literal ``__orig_<c>`` input column must not become a
    duplicate name — same discipline as filters.py's ``__might_contain``)."""
    work = df
    renames = []
    for c in [c for c in sig_cols if c in df.columns]:
        aside = f"__orig_{c}"
        while aside in work.columns:
            aside = "_" + aside
        work = work.withColumnRenamed(c, aside)
        renames.append((c, aside))
    return work, renames


def _restore_aside(out, renames):
    for c, aside in renames:
        out = out.withColumnRenamed(aside, c)
    return out


def gopher_filter(df, text_col: str, **kwargs):
    """Keep only documents passing every Gopher rule; returns ``df``'s
    columns unchanged — names AND values (input columns colliding with
    the signal names are protected, not recomputed)."""
    from pyspark.sql import functions as F

    sig = [
        c
        for c in with_gopher_quality(
            df.select(text_col).limit(0), text_col, **kwargs
        ).columns
        if c != text_col
    ]
    work, collide = _rename_aside(df, sig)
    out = (
        with_gopher_quality(work, text_col, **kwargs)
        .filter(F.col("gopher_pass"))
        .drop(*sig)
    )
    return _restore_aside(out, collide).select(*df.columns)


def with_fingerprint(df, text_col: str, out_col: str = "fingerprint"):
    """64-bit content fingerprint of whitespace-normalized, lowercased text
    (exact-dup detection key that survives formatting differences)."""
    from pyspark.sql import functions as F

    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn(out_col, F.xxhash64(norm))


#: PII patterns restricted to the Java-regex ∩ RE2 common subset (no
#: lookaround), so the Spark expressions and the DuckDB oracle run the
#: SAME pattern strings. Scrub order is dict order: emails first (their
#: dotted domains would otherwise be half-eaten by the phone pattern),
#: then IPv4 (so phone never swallows a dotted quad), then phone.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
}


def with_pii_counts(df, text_col: str):
    """Audit pass: per-category PII match counts (``n_email``/``n_ipv4``/
    ``n_phone``) as pure Column expressions — non-overlapping regexp
    counts, same semantics both engines."""
    from pyspark.sql import functions as F

    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    return out


def scrub_pii(df, text_col: str, out_col: str | None = None):
    """Replace every PII match with ``<KIND>`` (e.g. ``<EMAIL>``),
    applying the patterns in ``PII_PATTERNS`` order (documented there —
    order matters where patterns could overlap). Pure regexp_replace
    chain: one scan, JVM-side, no Python."""
    from pyspark.sql import functions as F

    col = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, F.lit(pat), F.lit(f"<{kind.upper()}>"))
    return df.withColumn(out_col or text_col, col)


#: terminal punctuation accepted by the C4 line rule (Raffel et al.
#: 2020 §2.2 keeps "lines that ended in a terminal punctuation mark";
#: the quote characters follow the public C4 implementation).
_C4_TERMINAL_RE = "[.!?\"']$"


def with_c4_lines(
    df,
    text_col: str,
    min_words: int = 5,
    min_kept_lines: int = 3,
):
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2) as pure Column
    expressions, doc-local, one scan:

    - a LINE is kept iff it has >= ``min_words`` single-space words AND
      ends in terminal punctuation AND does not mention "javascript"
      (case-insensitive);
    - ``c4_text`` = the kept lines re-joined with newlines,
      ``n_kept_lines`` = how many survived;
    - ``c4_keep`` (the DOC rule) = at least ``min_kept_lines`` kept
      lines AND the original text contains neither ``{`` nor
      "lorem ipsum" (case-insensitive).

    The three-sentence-span dedup C4 also applies is a corpus-level op —
    that is ``substring_dedup`` / ``dedup_corpus`` in this library."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    kept = F.filter(
        F.split(t, "\n"),
        lambda l: (F.size(F.split(l, " ")) >= F.lit(min_words))
        & l.rlike(_C4_TERMINAL_RE)
        & ~F.lower(l).contains("javascript"),
    )
    return (
        df.withColumn("c4_text", F.array_join(kept, "\n"))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn(
            "c4_keep",
            (F.col("n_kept_lines") >= F.lit(min_kept_lines))
            & ~t.contains("{")
            & ~F.lower(t).contains("lorem ipsum"),
        )
    )


def c4_filter(df, text_col: str, **kwargs):
    """Apply the C4 rules and keep only passing docs, with ``text_col``
    replaced by the cleaned (kept-lines) text; other columns unchanged
    (names and values — colliding inputs protected)."""
    from pyspark.sql import functions as F

    sig = ["c4_text", "n_kept_lines", "c4_keep"]
    work, collide = _rename_aside(df, sig)
    out = (
        with_c4_lines(work, text_col, **kwargs)
        .filter(F.col("c4_keep"))
        .withColumn(text_col, F.col("c4_text"))
        .drop(*sig)
    )
    return _restore_aside(out, collide).select(*df.columns)
