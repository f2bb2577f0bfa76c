"""Byte-level BPE: trainer determinism + hand-checked merges, encode ==
driver reference, exact roundtrip on unicode, serialization contract,
plan shapes (one word-count shuffle for train, zero-shuffle encode)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recsplit_spark.pipeline.bpe import (
    BPETokenizer,
    _encode_token,
    _merge_word,
    _train_merges,
)


def _corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cats sat on the mats"),
        (2, "a cat and a cat and a cat"),
        (3, "mats and cats and hats"),
        (4, "the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_word_non_overlapping():
    assert _merge_word([1, 1, 1, 1], 1, 1, 9) == [9, 9]
    assert _merge_word([1, 1, 1], 1, 1, 9) == [9, 1]
    assert _merge_word([1, 2, 1, 2], 1, 2, 9) == [9, 9]
    assert _merge_word([], 1, 2, 9) == []


def test_train_merges_hand_checked():
    # classic fixture: "aaab" x3 + "ab" x2 (byte values a=97, b=98)
    words = [b"aaab", b"ab"]
    counts = np.array([3, 2], dtype=np.int64)
    m = _train_merges(words, counts, 3)
    # pairs: (a,a) = 2 per "aaab" x3 = 6; (a,b) = 3 + 2 = 5 -> merge (a,a)
    assert tuple(m[0]) == (97, 97)
    # now "aaab" = [256, a, b]: pairs (256,a)=3, (a,b)=5 -> merge (a,b)=257
    assert tuple(m[1]) == (97, 98)
    # "aaab" = [256, 257] x3, "ab" = [257] x2 -> merge (256, 257)
    assert tuple(m[2]) == (256, 257)


def test_train_tie_break_is_smallest_pair():
    # "ab" and "cd" both occur twice -> tie broken to (a, b)
    m = _train_merges([b"ab", b"cd"], np.array([2, 2]), 1)
    assert tuple(m[0]) == (97, 98)


def test_encode_token_uses_rank_order():
    ranks = {(97, 97): 0, (97, 98): 1, (256, 257): 2}
    assert _encode_token(b"aaab", ranks) == [258]  # full merge chain
    assert _encode_token(b"aaab", {(97, 97): 0, (97, 98): 1}) == [256, 257]
    assert _encode_token(b"ab", ranks) == [257]
    assert _encode_token(b"zz", ranks) == [122, 122]
    assert _encode_token(b"", ranks) == []


def test_train_is_deterministic(spark):
    df = _corpus(spark)
    a = BPETokenizer.train(df, "text", vocab_size=300)
    b = BPETokenizer.train(df.repartition(7), "text", vocab_size=300)
    np.testing.assert_array_equal(a.merges, b.merges)
    # the tiny fixture's merge space exhausts at exactly 21 merges (sum
    # of per-distinct-pre-token (bytes - 1)); a trainer regression that
    # stops early (or a heap bug) moves this number
    assert a.vocab_size == 277


def test_distributed_encode_matches_driver_and_roundtrips(spark):
    df = _corpus(spark)
    tok = BPETokenizer.train(df, "text", vocab_size=280)
    enc = tok.encode(df, "text")
    got = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    for r in df.collect():
        assert got[r["doc_id"]] == tok.encode_text(r["text"])
        assert tok.decode_ids(got[r["doc_id"]]) == r["text"]
    # distributed decode inverts distributed encode
    dec = tok.decode(enc, "tokens", out_col="text2")
    assert dec.filter(F.col("text2") != F.col("text")).count() == 0


def test_roundtrip_exact_on_unicode(spark):
    rows = [
        (0, "héllo wörld — ünïcode"),
        (1, "数据 管道 🚀 test"),
        (2, ""),
        (3, "  spaces\tand\nnewlines  "),
        (4, None),  # NULL text must stay NULL, never become 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = BPETokenizer.train(_corpus(spark), "text", vocab_size=270)
    enc = tok.encode(df, "text")
    assert enc.filter("doc_id = 4").collect()[0]["tokens"] is None
    out = tok.decode(enc, "tokens", out_col="text2")
    assert out.filter(F.col("text2") != F.col("text")).count() == 0
    assert out.filter("doc_id = 4").collect()[0]["text2"] is None
    df = df.filter("text is not null")
    # byte-level base alphabet: ids always < vocab_size, no UNK ever
    mx = tok.encode(df, "text").select(
        F.max(F.array_max("tokens")).alias("m")
    ).collect()[0]["m"]
    assert mx < tok.vocab_size


def test_min_count_and_max_words_cap_the_table(spark):
    df = _corpus(spark)
    # min_count high enough that only " the"/"the" survive -> merges only
    # from those words
    tok = BPETokenizer.train(df, "text", vocab_size=400, min_count=5)
    v = tok.vocab()
    for merged in v[256:]:
        assert merged.decode("utf-8").strip() in ("t", "th", "the", "h", "he")


def test_serialization_roundtrip():
    m = np.array([[97, 98], [256, 99]], dtype=np.int32)
    tok = BPETokenizer(m)
    blob = tok.to_bytes()
    back = BPETokenizer.from_bytes(blob)
    np.testing.assert_array_equal(back.merges, m)
    assert back.to_bytes() == blob
    with pytest.raises(ValueError, match="magic"):
        BPETokenizer.from_bytes(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="length"):
        BPETokenizer.from_bytes(blob[:-4])


def test_vocab_expansion():
    tok = BPETokenizer(np.array([[104, 105], [256, 33]], dtype=np.int32))
    v = tok.vocab()
    assert v[256] == b"hi" and v[257] == b"hi!"
    assert tok.vocab_size == 258


def test_encode_plan_has_no_shuffle(spark):
    """At-scale shape: an input with >= defaultParallelism partitions
    encodes with ZERO shuffle (the round-6 parallelism floor is a no-op
    there); a single-partition local input gets exactly the one
    round-robin exchange the floor adds, with identical row values."""
    df = _corpus(spark)
    tok = BPETokenizer(np.array([[97, 98]], dtype=np.int32))
    par = df.sparkSession.sparkContext.defaultParallelism
    wide = df.repartition(par).localCheckpoint()
    plan = (
        tok.encode(wide, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    narrow = df.coalesce(1).localCheckpoint()
    enc = tok.encode(narrow, "text")
    plan1 = enc._jdf.queryExecution().executedPlan().toString()
    assert plan1.count("Exchange") == (1 if par > 1 else 0)
    a = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    b = {r["doc_id"]: r["tokens"] for r in tok.encode(wide, "text").collect()}
    assert a == b


def test_train_wordcount_is_single_shuffle(spark):
    """The training scan's plan: explode -> partial agg -> ONE exchange
    -> final agg (+ the orderBy-limit's TakeOrdered, which is not a
    shuffle of the corpus)."""
    from pyspark.sql import functions as F2

    from recsplit_spark.pipeline.text import BPE_TOKEN_PATTERN

    df = _corpus(spark)
    toks = df.select(
        F2.explode(
            F2.regexp_extract_all(F2.col("text"), F2.lit(BPE_TOKEN_PATTERN), 0)
        ).alias("w")
    )
    wc = toks.groupBy("w").agg(F2.count("*").alias("c"))
    plan = wc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_roundtrip_property_driver_side():
    """Any unicode string round-trips through encode_text/decode_ids for
    ANY merge table (byte-level base alphabet: no UNK, no normalization)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = BPETokenizer(
        np.array([[101, 32], [116, 104], [256, 257]], dtype=np.int32)
    )

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def _check(s):
        assert tok.decode_ids(tok.encode_text(s)) == s

    _check()
