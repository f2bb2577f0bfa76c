"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash),
text analysis (token counts, quality, language ID, fingerprints),
similarity search (brute-force cosine + IVF), multimodal column plumbing."""

from . import ann, dedup, incremental_dedup, multimodal, text  # noqa: F401
