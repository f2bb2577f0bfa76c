"""Deterministic synthetic fixture tables (FIXTURES.md recipes).

``sequences``: the primary input shape from BASELINE.json input_hint —
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string) — generated
by seed-pinned mix64 arithmetic so any (n) reproduces byte-identical rows on
any cluster (reference analogue: ``utils/RandomSetGenerator.java``, used for
10^12-key tests without storing the key set).
"""

from __future__ import annotations

import numpy as np

from .hashing import mix64

_DOC_C = np.uint64(0x9E3779B97F4A7C15)
_NTOK_C = np.uint64(0xD6E8FEB86659FD93)
_SOURCES = np.array(["web", "books", "code", "wiki"])
_VOCAB = 50_257  # GPT-2-ish vocab size (FIXTURES.md F1)


def sequence_batch(lo: int, hi: int, with_tail: bool = False):
    """Rows [lo, hi) of the deterministic sequences table (numpy columns)."""
    i = np.arange(lo, hi, dtype=np.uint64)
    doc_hash = mix64(i ^ _DOC_C)
    n_tok = (16 + (mix64(i ^ _NTOK_C) % np.uint64(497))).astype(np.int64)
    if with_tail:  # 1% long tail for quantile-sketch coverage
        tail = (mix64(i + np.uint64(7)) % np.uint64(100)) == 0
        n_tok = np.where(tail, n_tok * 8, n_tok)
    src = _SOURCES[(mix64(i) % np.uint64(4)).astype(np.int64)]
    doc_ids = [f"doc-{h:016x}" for h in doc_hash.tolist()]
    # tokens[j] = mix64(i*1_000_003 + j) % VOCAB, flattened batch-wide
    total = int(n_tok.sum())
    row_of = np.repeat(np.arange(len(i), dtype=np.int64), n_tok)
    ends = np.cumsum(n_tok)
    j = np.arange(total, dtype=np.int64) - np.repeat(ends - n_tok, n_tok)
    base = (i.astype(np.int64)[row_of] * 1_000_003 + j).astype(np.uint64)
    flat = (mix64(base) % np.uint64(_VOCAB)).astype(np.int32)
    splits = np.cumsum(n_tok)[:-1]
    tokens = np.split(flat, splits)
    return doc_ids, tokens, n_tok.astype(np.int32), src


def sequences(spark, n: int, partitions: int = 8, with_tail: bool = False):
    """Deterministic sequences DataFrame of ``n`` rows."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tok", IntegerType()),
            StructField("source", StringType()),
        ]
    )

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                doc_ids, tokens, n_tok, src = sequence_batch(lo, hi, with_tail)
                yield pd.DataFrame(
                    {
                        "doc_id": doc_ids,
                        "tokens": tokens,
                        "n_tok": n_tok,
                        "source": src,
                    }
                )

    bounds = np.linspace(0, n, partitions + 1, dtype=np.int64)
    ranges = [(int(lo), int(hi)) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    seed_df = spark.createDataFrame(ranges, "lo long, hi long").repartition(
        len(ranges), "lo"
    )
    return seed_df.mapInPandas(_gen, schema=schema)
