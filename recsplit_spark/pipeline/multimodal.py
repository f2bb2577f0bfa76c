"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with a metadata struct
(mime, width/height or sample rate, etc.). The Spark-side plumbing — schema,
batch iteration, partition sizing, UDF signatures — is real and tested, and
two REAL pure-numpy codecs are built in (no external media libraries
needed): binary PPM/PGM images (``decoder='ppm'``) and 16-bit PCM WAV audio
(``decoder='wav'``), each feeding a deterministic fixed-dim feature
extractor (block-mean image grid / windowed RMS+ZCR audio profile).
``decoder=None`` keeps the hash-based fake for payloads with no parseable
format; any callable plugs in a heavier codec (JPEG/MP3/...) unchanged.
"""

from __future__ import annotations

import struct

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


# ---------------------------------------------------------------------------
# real pure-numpy codecs (PPM/PGM images, PCM WAV audio)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) or PGM (P5) image into a uint8 array —
    (h, w, 3) for P6, (h, w) for P5. Pure numpy; handles '#' comments and
    maxval <= 255 (the binary-netpbm norm)."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic + 3 ints (width, height, maxval) in ASCII, '#' comments
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        tokens.append(payload[pos:end])
        pos = end
    w, h, maxval = (int(t) for t in tokens)
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval}")
    pos += 1  # single whitespace byte after maxval
    ch = 3 if payload[:2] == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=h * w * ch)
    return data.reshape(h, w, 3) if ch == 3 else data.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    """Serialize a uint8 (h, w, 3) or (h, w) array as binary PPM/PGM."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    magic = b"P6" if img.ndim == 3 else b"P5"
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a 16-bit PCM RIFF/WAVE payload -> (sample_rate, (n, ch) int16).
    Walks the chunk list (fmt / data may be preceded by LIST etc.)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack_from("<HHI", payload, body)
            (bits,) = struct.unpack_from("<H", payload, body + 14)
            if fmt != 1 or bits != 16:
                raise ValueError(f"only 16-bit PCM supported (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = payload[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return int(rate), samples.reshape(-1, n_ch)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Serialize (n,) or (n, ch) int16 samples as 16-bit PCM WAV."""
    s = np.ascontiguousarray(np.atleast_2d(samples.T).T, dtype="<i2")
    n_ch = s.shape[1] if s.ndim == 2 else 1
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim image descriptor: block-mean downsample to a g x g x ch
    grid (g chosen so g*g*ch <= dim), zero-padded, L2-normalized. Pure
    numpy reduceat — no per-pixel Python."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    g = max(1, int(np.sqrt(dim // ch)))
    rb = np.linspace(0, h, g + 1).astype(np.int64)[:-1]
    cb = np.linspace(0, w, g + 1).astype(np.int64)[:-1]
    f = img.astype(np.float64)
    f = np.add.reduceat(np.add.reduceat(f, rb, axis=0), cb, axis=1)
    area = np.diff(np.append(np.linspace(0, h, g + 1).astype(np.int64), h))[:g, None] * np.diff(
        np.append(np.linspace(0, w, g + 1).astype(np.int64), w)
    )[None, :g]
    f = (f / area[:, :, None]).ravel() / 255.0
    out = np.zeros(dim, dtype=np.float64)
    out[: len(f)] = f[:dim]
    return (out / max(np.linalg.norm(out), 1e-12)).astype(np.float32)


def audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim audio descriptor: mono mixdown, split into dim/2 windows,
    per-window RMS energy + zero-crossing rate, L2-normalized."""
    mono = samples.astype(np.float64).mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    mono = mono / 32768.0
    k = max(1, dim // 2)
    n = len(mono)
    out = np.zeros(dim, dtype=np.float64)
    if n:
        bounds = np.linspace(0, n, k + 1).astype(np.int64)
        seg = bounds[:-1]
        counts = np.maximum(np.diff(bounds), 1)
        rms = np.sqrt(np.add.reduceat(mono * mono, seg) / counts)
        flips = (np.signbit(mono[1:]) != np.signbit(mono[:-1])).astype(np.float64)
        zcr = np.add.reduceat(np.append(flips, 0.0), seg) / counts
        out[:k] = np.where(np.diff(bounds) > 0, rms, 0.0)
        out[k : 2 * k] = np.where(np.diff(bounds) > 0, zcr, 0.0)
    return (out / max(np.linalg.norm(out), 1e-12)).astype(np.float32)


def _ppm_decode_features(payload: bytes, dim: int) -> np.ndarray:
    return image_features(decode_ppm(payload), dim)


def _wav_decode_features(payload: bytes, dim: int) -> np.ndarray:
    return audio_features(decode_wav(payload)[1], dim)


def synthetic_ppm_media(spark, n: int, side: int = 32, partitions: int = 4):
    """Deterministic REAL-media table: payload = a decodable binary PPM
    (seeded gradient + hash-noise pattern per media_id)."""

    def _gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                ids = np.arange(lo, hi, dtype=np.int64)
                payloads = []
                for i in ids:
                    base = mix64(
                        np.arange(i, i + side * side * 3, dtype=np.uint64)
                    ) >> np.uint64(56)
                    img = base.astype(np.uint8).reshape(side, side, 3)
                    payloads.append(encode_ppm(img))
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "payload": payloads,
                        "mime": ["image/x-portable-pixmap"] * len(ids),
                        "width": np.full(len(ids), side, dtype=np.int32),
                        "height": np.full(len(ids), side, dtype=np.int32),
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

    ``decoder``: ``'ppm'`` (binary PPM/PGM images) and ``'wav'`` (16-bit PCM
    audio) are real built-in pure-numpy codecs; any callable
    ``(payload: bytes) -> np.ndarray[dim]`` plugs in a heavier decoder
    (JPEG/MP3/...); None uses the deterministic hash fake for opaque
    payloads.
    """
    if decoder == "ppm":
        dec = lambda p: _ppm_decode_features(p, dim)  # noqa: E731
    elif decoder == "wav":
        dec = lambda p: _wav_decode_features(p, dim)  # noqa: E731
    elif isinstance(decoder, str):
        raise ValueError(f"unknown decoder {decoder!r}; built-ins: 'ppm', 'wav'")
    else:
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
