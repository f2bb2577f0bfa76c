"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with a metadata struct
(mime, width/height or sample rate, etc.). The Spark-side plumbing — schema,
batch iteration, partition sizing, UDF signatures — is real and tested; the
actual codec step is pluggable and STUBBED here (this container ships no
image/audio libraries): ``decoder=None`` uses a deterministic fake that
derives features from a hash of the payload, so pipelines are testable
end-to-end without the heavy deps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hashing import mix64

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int"
)


def synthetic_media(spark, n: int, partitions: int = 4):
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    def _gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                ids = np.arange(lo, hi, dtype=np.int64)
                payloads = [
                    mix64(np.arange(i, i + 16, dtype=np.uint64)).tobytes() for i in ids
                ]
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "payload": payloads,
                        "mime": ["image/fake"] * len(ids),
                        "width": np.full(len(ids), 64, dtype=np.int32),
                        "height": np.full(len(ids), 64, dtype=np.int32),
                    }
                )

    bounds = np.linspace(0, n, partitions + 1, dtype=np.int64)
    ranges = [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    seed = spark.createDataFrame(ranges, "lo long, hi long").repartition(len(ranges), "lo")
    return seed.mapInPandas(_gen, schema=MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode->embed: features from payload hash."""
    h = mix64(np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint64))
    reps = int(np.ceil(dim / len(h)))
    v = np.tile(h, reps)[:dim].astype(np.float64)
    v = (v / 2**64) * 2 - 1
    return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)


def extract_features(
    df,
    payload_col: str = "payload",
    dim: int = 64,
    out_col: str = "features",
    decoder=None,
):
    """Add a feature vector column via mapInPandas over binary payloads.

    ``decoder(payload: bytes) -> np.ndarray[dim]`` plugs in a real
    image/audio decoder; None uses the deterministic fake. Raises
    NotImplementedError for decoder='real' to mark the integration point.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass a callable decoder instead"
        )
    dec = decoder or (lambda p: _fake_decode_features(p, dim))
    cols = df.columns

    def _feat(batches):
        for pdf in batches:
            feats = [dec(bytes(p)).tolist() for p in pdf[payload_col]]
            out = pdf[[c for c in cols if c != payload_col]].copy()
            out[out_col] = feats
            yield out

    keep = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    )
    return df.mapInPandas(_feat, schema=f"{keep}, {out_col} array<float>")


def frame_sample_plan(duration_s: float, fps: float, every_s: float) -> list[int]:
    """Deterministic frame-sampling plan (video): frame indices to decode."""
    if every_s <= 0 or fps <= 0:
        raise ValueError("fps and every_s must be positive")
    step = max(1, round(fps * every_s))
    return list(range(0, int(duration_s * fps), step))
