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


def _media_table(spark, n: int, partitions: int, payload_fn, mime: str,
                 side: int):
    """Seed-range scaffold shared by the synthetic media generators:
    partition the id range, then per range emit MEDIA_SCHEMA rows with
    ``payload_fn(media_id) -> bytes``."""

    def _gen(batches):
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                ids = np.arange(int(lo), int(hi), dtype=np.int64)
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "payload": [payload_fn(int(i)) for i in ids],
                        "mime": [mime] * len(ids),
                        "width": np.full(len(ids), side, dtype=np.int32),
                        "height": np.full(len(ids), side, dtype=np.int32),
                    }
                )

    bounds = np.linspace(0, n, partitions + 1, dtype=np.int64)
    ranges = [
        (int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    seed = spark.createDataFrame(ranges, "lo long, hi long").repartition(
        len(ranges), "lo"
    )
    return seed.mapInPandas(_gen, schema=MEDIA_SCHEMA)


def synthetic_media(spark, n: int, partitions: int = 4):
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    return _media_table(
        spark,
        n,
        partitions,
        lambda i: mix64(np.arange(i, i + 16, dtype=np.uint64)).tobytes(),
        "image/fake",
        64,
    )


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


def _seeded_frame(seed: int, side: int) -> np.ndarray:
    """Deterministic (side, side, 3) uint8 image from an integer seed."""
    base = mix64(
        np.arange(seed, seed + side * side * 3, dtype=np.uint64)
    ) >> np.uint64(56)
    return base.astype(np.uint8).reshape(side, side, 3)


def synthetic_ppm_media(spark, n: int, side: int = 32, partitions: int = 4):
    """Deterministic REAL-media table: payload = a decodable binary PPM
    (seeded gradient + hash-noise pattern per media_id)."""
    return _media_table(
        spark,
        n,
        partitions,
        lambda i: encode_ppm(_seeded_frame(i, side)),
        "image/x-portable-pixmap",
        side,
    )


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
    return _floor(df).mapInPandas(
        _feat, schema=f"{keep}, {out_col} array<float>"
    )


def _floor(df):
    """Parallelism floor for the payload-decode kernels (round 6): media
    decode is the heaviest per-row work in the repo, so a single-row-
    group local input must not serialize it onto one task. No-op on
    adequately-partitioned (at-scale) inputs — see
    session.ensure_min_partitions."""
    from ..session import ensure_min_partitions

    return ensure_min_partitions(df)


def frame_sample_plan(duration_s: float, fps: float, every_s: float) -> list[int]:
    """Deterministic frame-sampling plan (video): frame indices to decode.
    When the frame COUNT is known exactly, use ``frame_sample_plan_n`` —
    ``duration_s * fps`` can float-round below the true count and drop
    the final frame."""
    if every_s <= 0 or fps <= 0:
        raise ValueError("fps and every_s must be positive")
    return frame_sample_plan_n(int(duration_s * fps), fps, every_s)


def frame_sample_plan_n(n_frames: int, fps: float, every_s: float) -> list[int]:
    """``frame_sample_plan`` over an exact frame count (no duration
    round-trip): indices ``range(0, n_frames, round(fps * every_s))``."""
    if every_s <= 0 or fps <= 0:
        raise ValueError("fps and every_s must be positive")
    step = max(1, round(fps * every_s))
    return list(range(0, n_frames, step))


# ---------------------------------------------------------------------------
# image resize (pure numpy) + the distributed resize operator
# ---------------------------------------------------------------------------

def _resize_axis(f: np.ndarray, n_out: int, axis: int) -> np.ndarray:
    n_in = f.shape[axis]
    if n_out == n_in:
        return f
    if n_out < n_in:
        # area-mean downscale: contiguous pixel segments per output cell
        # (consecutive bounds differ by >= n_in/n_out > 1, so every
        # reduceat segment is nonempty)
        bounds = np.linspace(0, n_in, n_out + 1).astype(np.int64)
        s = np.add.reduceat(f, bounds[:-1], axis=axis)
        shape = [1] * f.ndim
        shape[axis] = n_out
        return s / np.diff(bounds).reshape(shape)
    # nearest-neighbour upscale
    idx = np.minimum((np.arange(n_out) * n_in) // n_out, n_in - 1)
    return np.take(f, idx, axis=axis)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize a uint8 (h, w[, ch]) image: area-mean per axis when
    shrinking (each output pixel is the mean of a contiguous input
    block — vectorized ``reduceat``, no per-pixel Python), nearest
    neighbour when growing. Channels/grayscale preserved."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError("output dims must be positive")
    f = img.astype(np.float64)
    f = _resize_axis(f, out_h, axis=0)
    f = _resize_axis(f, out_w, axis=1)
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def resize_media(df, out_h: int, out_w: int, payload_col: str = "payload"):
    """Distributed image resize: decode PPM/PGM payloads, resize, and
    re-encode, updating the ``width``/``height`` metadata columns when
    present. Binary-in/binary-out over ``mapInPandas`` — payload bytes
    never leave the executor, and the output row shape equals the input
    shape, so resize chains with ``extract_features`` / any media op."""
    cols = df.columns

    def _rs(batches):
        for pdf in batches:
            out = pdf.copy()
            out[payload_col] = [
                encode_ppm(resize_image(decode_ppm(bytes(p)), out_h, out_w))
                for p in pdf[payload_col]
            ]
            if "width" in out.columns:
                out["width"] = np.int32(out_w)
            if "height" in out.columns:
                out["height"] = np.int32(out_h)
            yield out[cols]

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return _floor(df).mapInPandas(_rs, schema=schema)


def _id_type(df, id_col: str) -> str:
    """Spark type string of ``id_col``, with a clear error when absent
    (shared by every media operator that re-emits the id column)."""
    for f in df.schema.fields:
        if f.name == id_col:
            return f.dataType.simpleString()
    raise ValueError(
        f"id column {id_col!r} not in DataFrame (have {df.columns})"
    )


def _to_i64(u: int) -> int:
    """uint64 bit pattern -> signed int64 (Spark ``long`` two's
    complement convention, shared by every 64-bit media fingerprint)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def _hash_media_col(df, id_col: str, payload_col: str, out_col: str, fn):
    """DataFrame[id_col, out_col long]: 64-bit fingerprint per payload
    via ``fn(payload: bytes) -> signed int64``, one ``mapInPandas``
    pass emitting 8 bytes per payload (the shared kernel under
    ``with_phash`` / ``with_audio_fingerprint``)."""
    id_type = _id_type(df, id_col)

    def _h(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: np.array(
                        [fn(bytes(p)) for p in pdf[payload_col]],
                        dtype=np.int64,
                    ),
                }
            )

    return _floor(df.select(id_col, payload_col)).mapInPandas(
        _h, schema=f"{id_col} {id_type}, {out_col} long"
    )


def image_phash(img: np.ndarray) -> int:
    """64-bit block-mean perceptual hash: grayscale -> area-mean resize
    to 8x8 (``resize_image``) -> threshold at the median -> 64 bits
    (row-major, MSB first). Robust to resize/re-encode/small noise —
    near-copies land within a few bits of Hamming distance. Returns a
    SIGNED int64 (the Spark ``long`` convention; uint64 bit pattern
    preserved via two's complement)."""
    if img.ndim == 3:
        img = img.astype(np.float64).mean(axis=2)
    g = resize_image(img.astype(np.uint8), 8, 8).astype(np.float64)
    bits = (g > np.median(g)).ravel()
    return _to_i64(int.from_bytes(np.packbits(bits).tobytes(), "big"))


def with_phash(df, id_col: str = "media_id", payload_col: str = "payload",
               out_col: str = "phash", decoder=None):
    """DataFrame[id_col, out_col long]: perceptual hash per image
    payload. ``decoder=None`` uses the built-in PPM/PGM codec; any
    callable ``(payload: bytes) -> np.ndarray`` plugs in JPEG etc."""
    dec = decoder or decode_ppm
    return _hash_media_col(
        df, id_col, payload_col, out_col, lambda p: image_phash(dec(p))
    )


def image_near_dup_pairs(df, id_col: str = "media_id",
                         payload_col: str = "payload",
                         max_hamming: int = 6, bucket_cap: int = 1000,
                         decoder=None):
    """Image near-duplicate pairs: perceptual hash + pigeonhole Hamming
    blocking (``dedup.hamming_near_pairs`` — the SimHash machinery over
    the phash column). One decode pass emits 8 bytes/image; everything
    after is the bucketed int64 pipeline, so the image payloads never
    enter the join."""
    from .dedup import hamming_near_pairs

    ph = with_phash(df, id_col, payload_col, decoder=decoder)
    return hamming_near_pairs(
        ph, id_col, "phash", max_hamming=max_hamming, bucket_cap=bucket_cap
    )


def resample_audio_samples(samples: np.ndarray, in_rate: int,
                           out_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (n[, ch]) int16 PCM to
    ``out_rate`` — the audio analogue of ``resize_image`` (good enough
    for feature pipelines; a windowed-sinc decoder plugs in through the
    same operator when fidelity matters). Pure ``np.interp`` per
    channel."""
    if in_rate <= 0 or out_rate <= 0:
        raise ValueError("rates must be positive")
    if samples.ndim == 1:
        samples = samples[:, None]
    n = samples.shape[0]
    if n == 0 or in_rate == out_rate:
        return samples.astype(np.int16)
    m = max(1, int(round(n * out_rate / in_rate)))
    t_out = np.arange(m, dtype=np.float64) * (in_rate / out_rate)
    t_in = np.arange(n, dtype=np.float64)
    out = np.empty((m, samples.shape[1]), dtype=np.int16)
    for c in range(samples.shape[1]):
        out[:, c] = np.clip(
            np.rint(np.interp(t_out, t_in, samples[:, c].astype(np.float64))),
            -32768,
            32767,
        ).astype(np.int16)
    return out


def resample_media(df, out_rate: int, payload_col: str = "payload"):
    """Distributed audio resample: decode 16-bit PCM WAV payloads,
    linear-resample to ``out_rate``, re-encode. Binary-in/binary-out
    over ``mapInPandas`` (same shape contract as ``resize_media``), so
    it chains with ``extract_features(decoder='wav')``."""
    cols = df.columns

    def _rs(batches):
        for pdf in batches:
            out = pdf.copy()
            blobs = []
            for p in pdf[payload_col]:
                rate, samples = decode_wav(bytes(p))
                blobs.append(
                    encode_wav(
                        resample_audio_samples(samples, rate, out_rate),
                        out_rate,
                    )
                )
            out[payload_col] = blobs
            yield out[cols]

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return _floor(df).mapInPandas(_rs, schema=schema)


def audio_fingerprint(samples: np.ndarray) -> int:
    """64-bit energy-delta audio fingerprint: mono mixdown -> 65
    duration-relative mean-energy blocks -> bit i = energy[i+1] >
    energy[i] (MSB first). The audio analogue of ``image_phash``:
    invariant to volume scaling (strict comparisons on squared means)
    and robust to sample-rate conversion (block boundaries are
    FRACTIONS of total duration, so a resampled copy lands within a
    few Hamming bits — measured <= 2 on the seeded fixture for a
    halve-volume + 8k->12k resample chain). Returns a SIGNED int64
    (Spark ``long`` convention; two's complement)."""
    mono = (
        samples.astype(np.float64).mean(axis=1)
        if samples.ndim == 2
        else samples.astype(np.float64)
    )
    n = len(mono)
    if n == 0:
        return 0
    bounds = np.linspace(0, n, 66).astype(np.int64)
    cs = np.concatenate(([0.0], np.cumsum(mono * mono)))
    energy = (cs[bounds[1:]] - cs[bounds[:-1]]) / np.maximum(
        np.diff(bounds), 1
    )
    bits = energy[1:] > energy[:-1]
    return _to_i64(int.from_bytes(np.packbits(bits).tobytes(), "big"))


def with_audio_fingerprint(df, id_col: str = "media_id",
                           payload_col: str = "payload",
                           out_col: str = "afp", decoder=None):
    """DataFrame[id_col, out_col long]: energy-delta fingerprint per
    audio payload. ``decoder=None`` uses the built-in 16-bit PCM WAV
    codec; any callable ``(payload: bytes) -> (rate, np.ndarray)``
    plugs in MP3/FLAC etc."""
    dec = decoder or decode_wav
    return _hash_media_col(
        df, id_col, payload_col, out_col,
        lambda p: audio_fingerprint(dec(p)[1]),
    )


def audio_near_dup_pairs(df, id_col: str = "media_id",
                         payload_col: str = "payload",
                         max_hamming: int = 6, bucket_cap: int = 1000,
                         decoder=None):
    """Audio near-duplicate pairs: energy-delta fingerprint + pigeonhole
    Hamming blocking (``dedup.hamming_near_pairs`` — the same generic
    64-bit machinery as SimHash and ``image_near_dup_pairs``). One
    decode pass emits 8 bytes/clip; the PCM payloads never enter the
    join."""
    from .dedup import hamming_near_pairs

    fp = with_audio_fingerprint(df, id_col, payload_col, decoder=decoder)
    return hamming_near_pairs(
        fp, id_col, "afp", max_hamming=max_hamming, bucket_cap=bucket_cap
    )


def _seeded_clip(seed: int, n: int = 6500) -> np.ndarray:
    """Deterministic (n,) int16 mono clip from an integer seed: 65
    mix64-derived per-block amplitude envelopes over a mix64
    pseudo-noise carrier — block energies are distinct by construction,
    so fingerprints are stable under resampling (the fixture the
    audio-near-dup tests and oracle query plant copies into)."""
    scale = np.float64(2.0**64)
    env_u = mix64(np.arange(seed, seed + 65, dtype=np.uint64))
    env = 0.15 + 0.85 * (env_u.astype(np.float64) / scale)
    env_full = np.repeat(env, int(np.ceil(n / 65)))[:n]
    car_u = mix64(
        np.arange(seed * 131 + 7, seed * 131 + 7 + n, dtype=np.uint64)
    )
    car = (car_u.astype(np.float64) / scale) * 2 - 1
    return np.rint(env_full * car * 8000).astype(np.int16)


# ---------------------------------------------------------------------------
# video container (seekable concatenated-PPM) + sparse frame sampling
# ---------------------------------------------------------------------------

_PPMV_MAGIC = b"PPMV1\n"


def encode_ppm_video(frames: list[np.ndarray], fps: float) -> bytes:
    """Serialize frames as a seekable MJPEG-style container: header
    (magic, fps f64, n_frames u32) + a u64 FRAME OFFSET TABLE + the
    concatenated binary PPM frames. The offset table is the scale
    feature: frame i is ``payload[off[i]:off[i+1]]``, so sampling k of n
    frames slices k byte ranges and never touches — let alone decodes —
    the other n-k (real video containers expose the same via their
    keyframe index)."""
    if not frames:
        raise ValueError("pass at least one frame")
    blobs = [encode_ppm(f) for f in frames]
    head_len = len(_PPMV_MAGIC) + 8 + 4 + 8 * (len(blobs) + 1)
    offs = np.cumsum([head_len] + [len(b) for b in blobs]).astype("<u8")
    return (
        _PPMV_MAGIC
        + struct.pack("<dI", float(fps), len(blobs))
        + offs.tobytes()
        + b"".join(blobs)
    )


def ppm_video_info(payload: bytes) -> tuple[float, int, np.ndarray]:
    """Parse a PPMV1 header -> (fps, n_frames, frame offset table)."""
    if payload[: len(_PPMV_MAGIC)] != _PPMV_MAGIC:
        raise ValueError("not a PPMV1 payload")
    pos = len(_PPMV_MAGIC)
    fps, n = struct.unpack_from("<dI", payload, pos)
    offs = np.frombuffer(payload, dtype="<u8", offset=pos + 12, count=n + 1)
    return float(fps), int(n), offs


def decode_ppm_video_frame(payload: bytes, i: int) -> np.ndarray:
    """Decode ONLY frame ``i`` via the offset table (O(frame bytes))."""
    _, n, offs = ppm_video_info(payload)
    if not 0 <= i < n:
        raise ValueError(f"frame {i} out of range [0, {n})")
    return decode_ppm(payload[offs[i] : offs[i + 1]])


def frame_sample(df, every_s: float, payload_col: str = "payload",
                 id_col: str = "media_id"):
    """Sparse frame sampling over PPMV1 video payloads: one output row
    per PLANNED frame (``frame_sample_plan`` on each video's own
    fps/length) with the frame re-emitted as a standalone PPM payload —
    the shape ``extract_features(decoder='ppm')`` / ``resize_media``
    consume, so video chains into the image pipeline. Unsampled frames
    are never decoded OR copied: the kernel slices the offset table
    (byte-range reads), so cost scales with sampled bytes, not video
    bytes. Returns DataFrame[id_col, frame_idx int, t_s double,
    payload binary]; ``id_col`` keeps its input type."""
    id_type = _id_type(df, id_col)

    def _sample(batches):
        for pdf in batches:
            ids, idxs, ts, blobs = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                fps, n, offs = ppm_video_info(p)
                # exact count, never the duration round-trip: n/fps*fps
                # can float-round below n and silently drop final frames
                for i in frame_sample_plan_n(n, fps, every_s):
                    ids.append(mid)
                    idxs.append(i)
                    ts.append(i / fps)
                    blobs.append(p[offs[i] : offs[i + 1]])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "t_s": np.array(ts, dtype=np.float64),
                    "payload": blobs,
                }
            )

    return _floor(df.select(id_col, payload_col)).mapInPandas(
        _sample,
        schema=(
            f"{id_col} {id_type}, frame_idx int, t_s double,"
            " payload binary"
        ),
    )


def with_frame_phash(df, every_s: float, id_col: str = "media_id",
                     payload_col: str = "payload"):
    """DataFrame[id_col, frame_idx int, phash long]: block-mean
    perceptual hash per sparsely-sampled video frame — ``frame_sample``
    (offset-table byte slicing; unsampled frames never decoded) chained
    into ``image_phash`` in one extra kernel stage."""
    id_type = _id_type(df, id_col)
    frames = frame_sample(df, every_s, payload_col, id_col)

    def _ph(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "frame_idx": pdf["frame_idx"],
                    "phash": np.array(
                        [
                            image_phash(decode_ppm(bytes(p)))
                            for p in pdf["payload"]
                        ],
                        dtype=np.int64,
                    ),
                }
            )

    return _floor(frames).mapInPandas(
        _ph, schema=f"{id_col} {id_type}, frame_idx int, phash long"
    )


def video_near_dup_pairs(df, id_col: str = "media_id",
                         payload_col: str = "payload",
                         every_s: float = 1.0, max_hamming: int = 6,
                         min_frames: int = 2, bucket_cap: int = 1000):
    """Video near-duplicate pairs: sparse-sampled frame phashes,
    pigeonhole Hamming blocking per frame (``dedup._pigeonhole_keys`` —
    the machinery shared with SimHash / image / audio near-dup), exact
    per-frame Hamming verify, then a video-level vote: a pair reports
    with ``n_frames_matched`` = the LEAST side's distinct matched frame
    positions, kept when >= ``min_frames``.

    Scale shape: the join input is 8 bytes/sampled frame (payloads never
    enter it); buckets shared by more than ``bucket_cap`` frames are
    DROPPED, not star-linked — a frame phash common to thousands of
    videos is boilerplate (title cards, black frames), and matching on
    it is noise as well as an N^2 join blowup. Star-linking (the text
    LSH guard) is wrong here because the video vote needs true pair
    multiplicity, not connectivity."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .dedup import _pigeonhole_keys

    ph = with_frame_phash(df, every_s, id_col, payload_col)
    keys = _pigeonhole_keys("phash", max_hamming)
    blocks = ph.select(
        id_col,
        "frame_idx",
        "phash",
        F.posexplode(F.array(*keys)).alias("band", "band_key"),
    )
    w = Window.partitionBy("band", "band_key")
    blocks = (
        blocks.withColumn("__n", F.count("*").over(w))
        .filter(F.col("__n") <= bucket_cap)
        .drop("__n")
    )
    a = blocks.select(
        F.col(id_col).alias("id_a"),
        F.col("frame_idx").alias("fi_a"),
        F.col("phash").alias("ph_a"),
        "band",
        "band_key",
    )
    b = blocks.select(
        F.col(id_col).alias("id_b"),
        F.col("frame_idx").alias("fi_b"),
        F.col("phash").alias("ph_b"),
        "band",
        "band_key",
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
            <= max_hamming
        )
        .select("id_a", "fi_a", "id_b", "fi_b")
        .distinct()
    )
    return (
        cand.groupBy("id_a", "id_b")
        .agg(
            F.countDistinct("fi_a").alias("__na"),
            F.countDistinct("fi_b").alias("__nb"),
        )
        .withColumn("n_frames_matched", F.least("__na", "__nb"))
        .filter(F.col("n_frames_matched") >= min_frames)
        .select("id_a", "id_b", "n_frames_matched")
    )


def synthetic_ppm_video(spark, n: int, n_frames: int = 24, side: int = 16,
                        fps: float = 8.0, partitions: int = 4):
    """Deterministic decodable video table: each payload is a PPMV1
    container of seeded gradient frames (frame f of video v depends
    only on (v, f))."""
    return _media_table(
        spark,
        n,
        partitions,
        lambda v: encode_ppm_video(
            [
                _seeded_frame(v * n_frames + f, side)
                for f in range(n_frames)
            ],
            fps,
        ),
        "video/x-ppmv",
        side,
    )
