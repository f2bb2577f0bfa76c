"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash),
benchmark decontamination, text analysis (token counts, quality, language
ID, fingerprints), BPE tokenizer training/encode, similarity search
(brute-force cosine + IVF + PQ/ADC), multimodal column plumbing,
deterministic training-shard output + epoch ordering."""

from . import (  # noqa: F401
    ann,
    bpe,
    classifier,
    decontaminate,
    dedup,
    dsir,
    incremental_ann,
    incremental_dedup,
    lm,
    mixing,
    multimodal,
    packing,
    pq,
    repetition,
    shards,
    splits,
    substring_dedup,
    text,
)
