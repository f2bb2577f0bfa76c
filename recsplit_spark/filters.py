"""Static membership filter = MPHF + per-key fingerprint.

The reference's "can be used as a static bloom filter, by storing a hash
fingerprint per key" (``README.md:10``); the C xor-filter evaluator
(``src/main/c/filter/xor.c:91-141``) is the same contract with a different
index function. Space = MPHF bits/key + fp_bits; false-positive rate =
2^-fp_bits for non-member keys; zero false negatives — vs a classic Bloom
filter's 1.44·log2(1/fpr) bits/key, this is within ~12% of the
information-theoretic floor at 8 bits.

Build is distributed: (idx, fingerprint) pairs are range-partitioned on the
MPHF index — the bijection onto [0, n) makes every range partition a DENSE
contiguous slice — and a ``mapInPandas`` pass packs each partition into one
(idx_lo, bytes) fragment, so the driver receives n bytes total in ~P rows
(descriptor-sized, NOT data-sized; at 10^9 keys: ~1 GB of fragments vs the
>16 GB of rows a ``toPandas`` would ship). Lookup broadcasts the
driver-decoded evaluator + table once per job; probe batches reuse the
per-process broadcast value (no per-batch descriptor re-parse).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from .mphf import MPHFDescriptor, RecSplitBuilder, gather_sig_array, key_sig_expr

def _sql_salt_lit(salt: int) -> str:
    """xxhash64 hashes the salt as an input column: the SQL literal type
    must match F.lit(int) (INT when it fits 32 bits, else BIGINT)."""
    return str(salt) if -(2**31) <= salt < 2**31 else f"{salt}L"


_MAGIC = b"MPFF"
_HDR = struct.Struct("<4sBxxxQI")  # magic, fp_bits, n, desc_len


def build_fingerprint_table(
    df, key_col: str, desc: MPHFDescriptor, fp_seed: int, fp_bits: int
) -> tuple[np.ndarray, int]:
    """Distributed dense-fragment fingerprint assembly: the (n,) uint8
    table for ``df``'s keys under ``desc``'s index mapping, fingerprints
    hashed with ``fp_seed``. Shared by ``MPHFFilter.build`` and the
    generational ``IncrementalMPHF`` (which pins ONE fp_seed across
    generations so route probes hash the key once). Returns
    ``(fp, n_fragments)``; see the module docstring for why the driver
    receives n bytes in ~P rows, not n Rows."""
    from pyspark.sql import functions as F

    mask = (1 << fp_bits) - 1
    pairs = desc.evaluate(df, key_col, out_col="__idx").select(
        "__idx",
        key_sig_expr(key_col, fp_seed, desc.key_mode)
        .bitwiseAND(F.lit(mask))
        .alias("__fp"),
    )
    # Dense-fragment assembly: the MPHF is a bijection onto [0, n), so a
    # range partition on __idx holds EVERY index in [min, max] of its
    # span exactly once — sort within the task and the fingerprints are
    # a contiguous byte slice of the final table. Driver receives one
    # (idx_lo, packed bytes) row per partition: n bytes total.
    spark = df.sparkSession
    nparts = max(1, min(spark.sparkContext.defaultParallelism, max(1, desc.n // 65536)))

    def _pack(batches):
        chunks = list(batches)
        if not chunks:
            return
        idx = np.concatenate([c["__idx"].to_numpy() for c in chunks])
        fpv = np.concatenate(
            [c["__fp"].to_numpy().astype(np.uint8) for c in chunks]
        )
        order = np.argsort(idx)
        idx = idx[order]
        lo = int(idx[0])
        if not (int(idx[-1]) - lo + 1 == len(idx)):
            raise RuntimeError("fingerprint fragment not dense (corrupt MPHF?)")
        yield pd.DataFrame({"idx_lo": [lo], "frag": [fpv[order].tobytes()]})

    frags = (
        pairs.repartitionByRange(nparts, "__idx")
        .mapInPandas(_pack, schema="idx_lo long, frag binary")
        .collect()
    )
    fp = np.zeros(desc.n, dtype=np.uint8)
    total = 0
    for r in frags:
        frag = np.frombuffer(bytes(r["frag"]), dtype=np.uint8)
        fp[r["idx_lo"] : r["idx_lo"] + len(frag)] = frag
        total += len(frag)
    if total != desc.n:
        raise RuntimeError(f"fingerprint fragments cover {total} != {desc.n} keys")
    return fp, len(frags)


class MPHFFilter:
    """Exact-for-members membership filter over a fixed key set."""

    def __init__(self, desc: MPHFDescriptor, fp: np.ndarray, fp_seed: int) -> None:
        self.desc = desc
        self.fp = fp  # (n,) uint8 fingerprints (fp_bits low bits used)
        self.fp_seed = fp_seed

    # -- construction -----------------------------------------------------------
    @classmethod
    def build(
        cls,
        df,
        key_col: str,
        leaf_size: int = 8,
        avg_bucket_size: int = 128,
        fp_bits: int = 8,
        builder: RecSplitBuilder | None = None,
    ) -> "MPHFFilter":
        if not (1 <= fp_bits <= 8):
            raise ValueError("fp_bits must be in [1, 8]")
        builder = builder or RecSplitBuilder(leaf_size, avg_bucket_size)
        desc = builder.build(df, key_col)
        fp_seed = desc.salt ^ 0x5F4A7C15
        fp, nfrags = build_fingerprint_table(df, key_col, desc, fp_seed, fp_bits)
        f = cls(desc, fp, fp_seed)
        f.fp_bits = fp_bits
        f.n_build_fragments = nfrags  # diagnostic: driver saw P rows, n bytes
        return f

    fp_bits: int = 8

    @property
    def bits_per_key(self) -> float:
        return 8.0 * len(self.to_bytes()) / max(1, self.desc.n)

    @property
    def false_positive_rate(self) -> float:
        return 2.0 ** -self.fp_bits

    # -- serialization ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        blob = self.desc.to_bytes()
        return (
            _HDR.pack(_MAGIC, self.fp_bits, self.desc.n, len(blob))
            + blob
            + self.fp.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "MPHFFilter":
        magic, fp_bits, n, dlen = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad filter header")
        off = _HDR.size
        desc = MPHFDescriptor.from_bytes(data[off : off + dlen])
        fp = np.frombuffer(data, dtype=np.uint8, offset=off + dlen, count=n).copy()
        f = cls(desc, fp, desc.salt ^ 0x5F4A7C15)
        f.fp_bits = fp_bits
        return f

    # -- lookup -----------------------------------------------------------------
    def might_contain_array(self, sigs: np.ndarray, fpsigs: np.ndarray) -> np.ndarray:
        idx = self.desc.evaluate_array(sigs)
        mask = np.int64((1 << self.fp_bits) - 1)
        return self.fp[idx] == (fpsigs & mask).astype(np.uint8)

    def might_contain(self, df, key_col: str, out_col: str = "might_contain"):
        """Append a boolean column: False guarantees non-membership; True is
        wrong with probability 2^-fp_bits for non-members.

        The Rice streams are decoded ONCE on the driver; the broadcast ships
        the decoded evaluator + fingerprint table, and ``bcast.value`` is
        deserialized once per executor process — probe batches do zero
        descriptor parsing (the round-1 version re-decoded the whole filter
        on every Arrow batch). Arrow-native UDF: the probe is pure int64 /
        uint8 array math, pandas Series wrapping was measured as ~half the
        round-2 probe cost (BASELINE.md NOOP control)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BooleanType

        ve = self.desc._evaluator()  # driver-side decode, see mphf.evaluate
        bcast = df.sparkSession.sparkContext.broadcast((ve, self.fp, self.fp_bits))

        @arrow_udf(BooleanType())
        def _check(sig: pa.Array, fpsig: pa.Array) -> pa.Array:
            ve, fp, fp_bits = bcast.value
            sigs = np.ascontiguousarray(
                sig.to_numpy(zero_copy_only=False), dtype=np.int64
            )
            idx = ve.evaluate(sigs)
            mask = np.int64((1 << fp_bits) - 1)
            want = (fpsig.to_numpy(zero_copy_only=False) & mask).astype(np.uint8)
            return pa.array(fp[idx] == want)

        km = self.desc.key_mode
        return df.withColumn(
            out_col,
            _check(
                key_sig_expr(key_col, self.desc.salt, km),
                key_sig_expr(key_col, self.fp_seed, km),
            ),
        )

    def register_sql(self, spark, name: str = "might_contain") -> None:
        """Expose the probe as a SQL scalar function ``<name>(key)`` —
        hashing stays JVM-side in the SQL wrapper (same two-layer pattern
        as ``MPHFDescriptor.register_sql``; both the index signature and
        the fingerprint signature are computed by xxhash64 with literals
        typed exactly like ``key_sig_expr``)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BooleanType

        ve = self.desc._evaluator()
        bcast = spark.sparkContext.broadcast((ve, self.fp, self.fp_bits))

        @arrow_udf(BooleanType())
        def _probe(sig: pa.Array, fpsig: pa.Array) -> pa.Array:
            ve, fp, fp_bits = bcast.value
            sigs = np.ascontiguousarray(
                sig.to_numpy(zero_copy_only=False), dtype=np.int64
            )
            idx = ve.evaluate(sigs)
            mask = np.int64((1 << fp_bits) - 1)
            want = (fpsig.to_numpy(zero_copy_only=False) & mask).astype(np.uint8)
            return pa.array(fp[idx] == want)

        spark.udf.register(f"_{name}_probe", _probe)
        cast = "BIGINT" if self.desc.key_mode == 1 else "STRING"
        arg = f"CAST(k AS {cast})"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(k {cast})"
            f" RETURNS BOOLEAN RETURN _{name}_probe("
            f"xxhash64({arg}, {_sql_salt_lit(self.desc.salt)}),"
            f" xxhash64({arg}, {_sql_salt_lit(self.fp_seed)}))"
        )


# ---------------------------------------------------------------------------
# XOR filter — the reference's second filter construction (filter/xor.c)
# ---------------------------------------------------------------------------

_XMAGIC = b"XORF"
_XHDR = struct.Struct("<4sBBxxQQqq")  # magic, key_mode, fp_bits, n, r, salt, seed
_XFP_SALT = 0x243F6A8885A308D3  # fingerprint-hash decorrelation constant


def _xor_fingerprints(sigs: np.ndarray, fp_bits: int) -> np.ndarray:
    from .hashing import mix64

    x = (sigs.view(np.uint64) + np.uint64(_XFP_SALT)).copy()
    return (mix64(x) & np.uint64((1 << fp_bits) - 1)).astype(np.uint8)


class XorFilter:
    """Static 3-hash XOR filter (``src/main/c/filter/xor.c:24-141``): b-bit
    fingerprints in 3 disjoint thirds of ceil(1.23n/3)+1 slots each;
    membership = fp(x) == B[h0(x)] ^ B[h1(x)] ^ B[h2(x)]. Space ~1.23*b
    bits/key (9.9 at b=8, vs the MPHF filter's ~10.0 incl. descriptor);
    zero false negatives, FPR 2^-b. Construction reuses the BDZ
    3-hypergraph peel (``bdz._peel``) — the xor filter IS the BDZ structure
    storing fingerprints instead of rank values.

    Build gathers 8-byte signatures to the driver (same gather-scale class
    as BDZBuilder, ~10^8 keys); ``MPHFFilter`` remains the fully
    distributed-build path.
    """

    fp_bits: int = 8

    def __init__(
        self, n: int, r: int, salt: int, seed: int, table: np.ndarray,
        key_mode: int = 0, fp_bits: int = 8,
    ) -> None:
        self.n = n
        self.r = r
        self.salt = salt
        self.seed = seed
        self.table = table  # (3r,) uint8
        self.key_mode = key_mode
        self.fp_bits = fp_bits

    # -- construction -----------------------------------------------------------
    @classmethod
    def build(cls, df, key_col: str, fp_bits: int = 8, salt: int = 0,
              max_salt_retries: int = 4) -> "XorFilter":
        if not (1 <= fp_bits <= 8):
            raise ValueError("fp_bits must be in [1, 8]")
        from .mphf import key_mode_for

        key_mode = key_mode_for(df, key_col)
        last: Exception | None = None
        for attempt in range(max_salt_retries):
            s = salt + attempt
            sigs = gather_sig_array(df, key_col, s, key_mode)
            try:
                return cls.from_sigs(sigs, fp_bits=fp_bits, salt=s, key_mode=key_mode)
            except ValueError as e:  # duplicate signature: re-salt
                last = e
        raise RuntimeError(
            f"duplicate keys persisted through {max_salt_retries} salt re-rolls: {last}"
        )

    @classmethod
    def from_sigs(cls, sigs: np.ndarray, fp_bits: int = 8, salt: int = 0,
                  key_mode: int = 0, max_seed_retries: int = 16) -> "XorFilter":
        from .bdz import PeelFailure, _GAMMA, _bdz_hashes, _peel

        sigs = np.ascontiguousarray(sigs, dtype=np.int64)
        n = len(sigs)
        if n == 0:
            return cls(0, 1, salt, 0, np.zeros(3, dtype=np.uint8), key_mode, fp_bits)
        if len(np.unique(sigs)) != n:
            raise ValueError("duplicate 64-bit signature in xor-filter input")
        r = int(np.ceil(_GAMMA * n / 3)) + 1
        m = 3 * r
        fpv = _xor_fingerprints(sigs, fp_bits)
        last: Exception | None = None
        for seed in range(max_seed_retries):
            H = _bdz_hashes(sigs, seed, r)
            try:
                rounds = _peel(H, m)
            except PeelFailure as e:
                last = e
                continue
            B = np.zeros(m, dtype=np.uint8)
            for e, free_v in reversed(rounds):
                # B[free_v] is still 0, so xor-ing all three slots with the
                # fingerprint solves fp == B[h0]^B[h1]^B[h2] for the free slot
                B[free_v] = fpv[e] ^ B[H[e, 0]] ^ B[H[e, 1]] ^ B[H[e, 2]]
            return cls(n, r, salt, seed, B, key_mode, fp_bits)
        raise RuntimeError(f"xor peeling failed after {max_seed_retries} seeds: {last}")

    # -- space ------------------------------------------------------------------
    @property
    def bits_per_key(self) -> float:
        return 8.0 * len(self.to_bytes()) / max(1, self.n)

    @property
    def false_positive_rate(self) -> float:
        return 2.0 ** -self.fp_bits

    # -- serialization ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return (
            _XHDR.pack(
                _XMAGIC, self.key_mode, self.fp_bits, self.n, self.r,
                self.salt, self.seed,
            )
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "XorFilter":
        magic, key_mode, fp_bits, n, r, salt, seed = _XHDR.unpack_from(data, 0)
        if magic != _XMAGIC:
            raise ValueError("bad xor-filter header")
        table = np.frombuffer(data, dtype=np.uint8, offset=_XHDR.size, count=3 * r)
        return cls(n, r, salt, seed, table.copy(), key_mode, fp_bits)

    # -- lookup -------------------------------------------------------------------
    def might_contain_array(self, sigs: np.ndarray) -> np.ndarray:
        from .bdz import _bdz_hashes

        H = _bdz_hashes(np.ascontiguousarray(sigs, dtype=np.int64), self.seed, self.r)
        got = self.table[H[:, 0]] ^ self.table[H[:, 1]] ^ self.table[H[:, 2]]
        return got == _xor_fingerprints(sigs, self.fp_bits)

    def might_contain(self, df, key_col: str, out_col: str = "might_contain"):
        """Append a boolean column; broadcast-once probe — the constructed
        filter object ships to each executor once (broadcast values are
        unpickled once per process), so batches do table gathers only."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BooleanType

        bcast = df.sparkSession.sparkContext.broadcast(self)

        @arrow_udf(BooleanType())
        def _check(sig: pa.Array) -> pa.Array:
            sigs = sig.to_numpy(zero_copy_only=False)
            return pa.array(bcast.value.might_contain_array(sigs))

        return df.withColumn(
            out_col, _check(key_sig_expr(key_col, self.salt, self.key_mode))
        )

    def register_sql(self, spark, name: str = "xor_might_contain") -> None:
        """SQL scalar function ``<name>(key)`` over the broadcast filter."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import BooleanType

        bcast = spark.sparkContext.broadcast(self)

        @arrow_udf(BooleanType())
        def _probe(sig: pa.Array) -> pa.Array:
            sigs = sig.to_numpy(zero_copy_only=False)
            return pa.array(bcast.value.might_contain_array(sigs))

        spark.udf.register(f"_{name}_probe", _probe)
        cast = "BIGINT" if self.key_mode == 1 else "STRING"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(k {cast})"
            f" RETURNS BOOLEAN RETURN _{name}_probe("
            f"xxhash64(CAST(k AS {cast}), {_sql_salt_lit(self.salt)}))"
        )


# ---------------------------------------------------------------------------
# semi-join reduction — the membership filter USED as a join pre-check
# ---------------------------------------------------------------------------

def _build_filter(keys, key_col: str, kind: str, fp_bits: int, salt: int):
    # membership is over the key SET: a duplicated dim/blocklist key (a
    # many-to-many dim, an event-derived blocklist) must not fail the
    # duplicate-rejecting MPHF/xor builds
    keys = keys.select(key_col).distinct()
    if kind == "xor":
        return XorFilter.build(keys, key_col, fp_bits=fp_bits, salt=salt)
    if kind == "mphf":
        if salt != 0:
            raise ValueError(
                "salt is only supported with kind='xor' — the MPHF build "
                "derives its own salts and would silently ignore it"
            )
        return MPHFFilter.build(keys, key_col, fp_bits=fp_bits)
    raise ValueError(f"filter kind must be 'xor' or 'mphf', got {kind!r}")


def _check_probe_key_mode(filt, big, big_key: str) -> None:
    """The probe hashes ``big[big_key]`` under the FILTER's key mode. If
    the big side's own mode differs (string keys vs integral keys), the
    hash inputs disagree even for values a plain join would coerce-match
    — silent FALSE NEGATIVES, i.e. dropped matches / resurrected
    blocklisted rows. Raise loudly instead (the CAST-disagreement trap)."""
    from .mphf import key_mode_for

    km_filter = getattr(filt, "key_mode", None)
    if km_filter is None:
        km_filter = filt.desc.key_mode
    km_big = key_mode_for(big, big_key)
    if km_big != km_filter:
        raise ValueError(
            f"key-mode mismatch: filter was built over a "
            f"{'long' if km_filter == 1 else 'string'}-hashed key set but "
            f"{big_key!r} on the big side is "
            f"{'integral' if km_big == 1 else 'non-integral'} — the probe "
            "would hash different bytes than the build and silently drop "
            "matches. Cast both key columns to one type first."
        )


def semi_join_prefilter(big, keys, key_col: str, big_key_col: str | None = None,
                        fp_bits: int = 8, salt: int = 0, kind: str = "xor",
                        filt=None):
    """Reduce ``big`` to rows whose key MIGHT appear in ``keys[key_col]`` —
    the reference's membership-filter use case (``README.md:10``) composed
    as the classic semi-join reduction: build a broadcast filter over the
    key universe, probe the huge table BEFORE its shuffle. Zero false
    negatives means an exact join downstream returns identical rows; the
    only cost of false positives (~2^-fp_bits of non-matching rows) is
    shuffle bytes the exact join discards.

    Operating envelope: a broadcast HASH join ships the dim ROWS
    (~tens of bytes each); the filter ships ~1.23*fp_bits bits/key
    (xor, 8 bits -> ~1.2 B/key), so key universes ~10-50x past the
    broadcast-join threshold still fit — 10^8 keys is a ~123 MB
    broadcast. ``kind='xor'`` gathers 8-byte signatures to the driver
    at build (the BDZ gather-scale class); ``kind='mphf'`` is the fully
    distributed build for larger universes. Pass a prebuilt/persisted
    ``filt`` to skip the build (ingest loops reuse one filter).

    Returns ``(filtered_big, filt)``.
    """
    from pyspark.sql import functions as F

    big_key = big_key_col or key_col
    if filt is None:
        filt = _build_filter(keys, key_col, kind, fp_bits, salt)
    _check_probe_key_mode(filt, big, big_key)
    out = "__might_contain"
    while out in big.columns:
        out = "_" + out
    filtered = filt.might_contain(big, big_key, out).filter(F.col(out)).drop(out)
    return filtered, filt


def prefiltered_join(big, dim, key_col: str, big_key_col: str | None = None,
                     fp_bits: int = 8, salt: int = 0, kind: str = "xor",
                     how: str = "inner", filt=None):
    """Exact equi-join of ``big`` with ``dim`` on ``key_col`` with a
    membership-filter semi-join reduction applied to the big side first
    (``semi_join_prefilter``). Result rows are IDENTICAL to the plain
    join — the filter has zero false negatives and the exact join
    discards its false positives — but only might-contain survivors
    enter the join shuffle.

    Only ``inner`` and ``left_semi`` are legal: an outer/anti join's
    non-matching big rows are part of the RESULT, so pre-dropping them
    changes the answer (use ``prefiltered_anti_join`` for the anti
    shape). When ``big_key_col`` differs, ``dim``'s key column is
    renamed to it before the join, so the output schema matches
    ``big.join(dim.withColumnRenamed(...), [big_key_col], how)``.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"prefiltered_join supports inner/left_semi, got {how!r} "
            "(outer/anti joins keep non-matching rows — prefiltering "
            "would change the result; see prefiltered_anti_join)"
        )
    big_key = big_key_col or key_col
    filtered, _ = semi_join_prefilter(
        big, dim, key_col, big_key, fp_bits=fp_bits, salt=salt, kind=kind,
        filt=filt,
    )
    rhs = dim.withColumnRenamed(key_col, big_key) if big_key != key_col else dim
    return filtered.join(rhs, [big_key], how)


def prefiltered_anti_join(big, keys, key_col: str,
                          big_key_col: str | None = None, fp_bits: int = 8,
                          salt: int = 0, kind: str = "xor", filt=None):
    """Exact ``left_anti`` of ``big`` against ``keys[key_col]`` (the
    blocklist-removal shape: drop every doc whose id appears in a known
    set) with the membership filter carrying the definite misses.

    ``might_contain == False`` GUARANTEES non-membership, so those rows
    are anti-join results with zero shuffle; only the might-contain
    survivors (true members + ~2^-fp_bits of the rest) go through the
    exact anti-join. Output rows are identical to
    ``big.join(keys, ..., 'left_anti')``; the shuffled fraction drops
    from 1.0 to member_fraction + 2^-fp_bits.

    Plan shape: the two output branches read ``big`` TWICE (each is a
    scan + broadcast probe, no exchange below the union) — that is the
    deliberate trade, since a narrow re-scan is far cheaper than the
    full shuffle sort an unfiltered anti-join pays at this size, and
    when ``keys`` is small enough for Spark to broadcast as rows the
    native broadcast anti-join needs no prefilter at all. This operator
    earns its keep in the middle regime: key sets past the row
    broadcast threshold but within the filter budget (~1.2 B/key).

    Determinism REQUIREMENT (not just a cost trade): because ``big`` is
    evaluated once per branch, a nondeterministic source — ``sample()``
    without a seed, ``rand()`` columns, a table mutating between the two
    scans — can make the branches disagree, dropping or duplicating rows
    relative to the plain ``left_anti``. Persist/localCheckpoint ``big``
    first in that case (the ``align_tombstone_ids`` precedent); for a
    deterministic source it merely saves the second scan.
    """
    from pyspark.sql import functions as F

    big_key = big_key_col or key_col
    if filt is None:
        filt = _build_filter(keys, key_col, kind, fp_bits, salt)
    _check_probe_key_mode(filt, big, big_key)
    out = "__might_contain"
    while out in big.columns:
        out = "_" + out
    probed = filt.might_contain(big, big_key, out)
    definite_miss = probed.filter(~F.col(out)).drop(out)
    survivors = probed.filter(F.col(out)).drop(out)
    rhs = keys.select(F.col(key_col).alias(big_key))
    return definite_miss.unionByName(
        survivors.join(rhs, [big_key], "left_anti")
    )
