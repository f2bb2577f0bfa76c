"""Static membership filter = MPHF + per-key fingerprint.

The reference's "can be used as a static bloom filter, by storing a hash
fingerprint per key" (``README.md:10``); the C xor-filter evaluator
(``src/main/c/filter/xor.c:91-141``) is the same contract with a different
index function. Space = MPHF bits/key + fp_bits; false-positive rate =
2^-fp_bits for non-member keys; zero false negatives — vs a classic Bloom
filter's 1.44·log2(1/fpr) bits/key, this is within ~12% of the
information-theoretic floor at 8 bits.

Build is distributed: the fingerprint table is filled from a
``mapInPandas`` pass (MPHF index → fingerprint byte), and only the n-byte
table returns to the driver (descriptor-sized, NOT data-sized). Lookup
broadcasts (descriptor + table) once per job.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .mphf import MPHFDescriptor, RecSplitBuilder, key_sig_expr

_MAGIC = b"MPFF"
_HDR = struct.Struct("<4sBxxxQI")  # magic, fp_bits, n, desc_len


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
        from pyspark.sql import functions as F

        builder = builder or RecSplitBuilder(leaf_size, avg_bucket_size)
        desc = builder.build(df, key_col)
        fp_seed = desc.salt ^ 0x5F4A7C15
        mask = (1 << fp_bits) - 1
        pairs = (
            desc.evaluate(df, key_col, out_col="__idx")
            .select(
                "__idx",
                key_sig_expr(key_col, fp_seed, desc.key_mode)
                .bitwiseAND(F.lit(mask))
                .alias("__fp"),
            )
            .toPandas()
        )
        fp = np.zeros(desc.n, dtype=np.uint8)
        fp[pairs["__idx"].to_numpy()] = pairs["__fp"].to_numpy().astype(np.uint8)
        f = cls(desc, fp, fp_seed)
        f.fp_bits = fp_bits
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
        wrong with probability 2^-fp_bits for non-members."""
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BooleanType

        bcast = df.sparkSession.sparkContext.broadcast(self.to_bytes())

        @pandas_udf(BooleanType())
        def _check(sig: pd.Series, fpsig: pd.Series) -> pd.Series:
            f = MPHFFilter.from_bytes(bcast.value)
            return pd.Series(
                f.might_contain_array(sig.to_numpy(), fpsig.to_numpy())
            )

        km = self.desc.key_mode
        return df.withColumn(
            out_col,
            _check(
                key_sig_expr(key_col, self.desc.salt, km),
                key_sig_expr(key_col, self.fp_seed, km),
            ),
        )
