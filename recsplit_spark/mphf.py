"""RecSplit MPHF over Spark DataFrames.

Public surface (reference analogue ``RecSplitBuilder`` /
``RecSplitEvaluator``, ``RecSplitBuilder.java:34-89``):

    desc = RecSplitBuilder(leaf_size=8, avg_bucket_size=128).build(df, "doc_id")
    df2  = desc.evaluate(df, "doc_id", out_col="mphf_index")
    blob = desc.to_bytes();  desc2 = MPHFDescriptor.from_bytes(blob)

Architecture (SURVEY §3.1 "Spark re-architecture"):

1. **Signature + bucket** are JVM-side Column expressions — ``xxhash64(key,
   salt)`` and a top-bits shift (``shiftrightunsigned``) — no Python touches
   raw keys (reference bucket assignment: ``FastGenerator.java:30-36``;
   salted hash family per the north rule).
2. **Shuffle** on bucket id replaces the reference's in-place counting-sort
   scatter (``FastGenerator.sortIntoBuckets``, ``FastGenerator.java:56-114``)
   — each bucket lands wholly inside one partition. Plain builds HASH-
   partition on the bucket id (no range-boundary sampling pass; the merge
   scatters per bucket, so range contiguity is unnecessary); checkpointed
   builds use ``repartitionByRange`` because resume membership is interval
   arithmetic over contiguous bucket ranges.
3. **Partition-parallel construction**: one Arrow-vectorized
   ``mapInPandas`` kernel per partition builds ALL its buckets (wavefront,
   see ``kernel.py``) and emits ONE row per partition: packed per-bucket
   streams + metadata arrays + lineage (part id, key count, wall time).
   This row stream doubles as the **per-bucket-range checkpoint** table
   (reference analogue: the HEM blocked file, ``hem/HemGenerator.java:29-33``).
4. **Associative merge**: per-bucket streams are byte-aligned and prefix
   sums are recomputed on the driver from (bucket, n_keys, byte_len), so
   ANY merge order / partial restart yields identical final bytes
   (north rule "associative bit-stream merge"; SURVEY §7 resume note).
5. **Skew / collisions**: duplicate 64-bit signatures or trial-limit
   blowups abort the job and the build retries with salt+1 (salt re-roll,
   reference overflow diversion ``Generator.java:465-469`` re-expressed);
   oversized buckets are handled by the rule table growing on demand.

Descriptor layout (self-describing, version byte; reference header:
``Generator.java:332-360`` / ``RecSplitEvaluator.java:29-54``):

    magic 'RSMP' | ver u8 | leaf u8 | bucket_log2 u8 | key_mode u8 | n u64 |
    salt i64 | avg_bucket u32 | mean_size u32 | alpha f64
    | len u32 + splitRice(zigzag(bucket sizes - mean_size))
    | len u32 + splitRice(zigzag(byte lens - floor(alpha*size))) | streams
"""

from __future__ import annotations

import struct
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from .codecs import rice_split_decode, rice_split_encode, unzigzag, zigzag
from .kernel import build_buckets, eval_bucket
from .settings import RULE_GEN, Settings, get_settings

_MAGIC = b"RSMP"
# v2: the former pad byte now carries key_mode (0=string, 1=long). Bumped so
# a v1 reader fails loudly instead of silently hashing long keys as strings.
# v3: the two Elias-Fano prefix-sum lists are replaced by signed-fold
# split-Rice deltas (sizes vs the mean; byte lengths vs an alpha*size linear
# predictor) — reference analogue of the Elias-Delta+fold header codes
# (BitBuffer.java:245-276); ~0.04 bits/key smaller at 16M keys.
#: v4 (round 3): appends a rule-generation byte after the fixed header —
#: the DP split rule is part of the wire format, and v4 headers pin which
#: generation encoded the streams. v3 (rounds 1-2) is still read: it
#: implies rule generation 0 (the uniform time weight those rounds used).
_VERSION = 4
_HDR = struct.Struct("<4sBBBBQqIId")  # ..., mean_size u32, alpha f64


def _bucket_of(sigs: np.ndarray, bucket_log2: int) -> np.ndarray:
    """Bucket id = top bits of the signature — MUST match the Spark-side
    ``shiftrightunsigned(sig, 64 - bucket_log2)`` (Java >>> semantics)."""
    if bucket_log2 == 0:
        return np.zeros(len(sigs), dtype=np.int64)
    shift = 64 - bucket_log2
    return (sigs >> shift) & np.int64((1 << bucket_log2) - 1)


def key_mode_for(df, key_col: str) -> int:
    """1 (native long hashing) for integral key columns, else 0 (string)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[key_col].dataType
    return 1 if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)) else 0


def key_sig_expr(key_col: str, salt: int, key_mode: int):
    """The canonical signature Column: must match between build and eval."""
    from pyspark.sql import functions as F

    col = F.col(key_col)
    cast = col.cast("long") if key_mode == 1 else col.cast("string")
    return F.xxhash64(cast, F.lit(salt))


def gather_sig_array(df, key_col: str, salt: int, key_mode: int) -> np.ndarray:
    """Driver-side gather of the signature column as ONE contiguous int64
    numpy array via the Arrow path (``DataFrame.toArrow``).

    This is the supported gather for the driver-global constructions
    (standalone BDZ, XorFilter): 8 bytes/key on the wire and in driver
    memory — a 10^8-key gather is ~800 MB of Arrow buffers, vs tens of GB
    of Row objects through ``collect()`` (the round-2 implementation).
    Beyond ~10^8 keys use the blocked builders, which never gather keys.
    """
    tbl = df.select(key_sig_expr(key_col, salt, key_mode).alias("sig")).toArrow()
    arr = tbl.column("sig").combine_chunks().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(arr, dtype=np.int64)


def bucket_log2_for(n: int, avg_bucket_size: int) -> int:
    """log2 of the (power-of-2) bucket count for n keys (reference rule:
    ``Settings.getBucketCount``, ``Settings.java:287-289``, rounded to the
    fast path's power-of-2 count, ``hem/recsplit/Builder.java:48-58``)."""
    import math

    target = max(1, round(n / avg_bucket_size))
    return max(0, math.ceil(math.log2(target)))


def build_descriptor_from_sigs(
    sigs: np.ndarray,
    leaf_size: int,
    avg_bucket_size: int,
    settings: Settings | None = None,
    salt: int = 0,
) -> MPHFDescriptor:
    """Single-process MPHF build over precomputed int64 signatures.

    This is the per-block kernel of the blocked 10^12-key path (reference
    analogue: the per-block single-threaded ``hem/recsplit/Builder.generate``,
    ``Builder.java:25-31``) and is also handy for no-Spark unit tests.
    Signatures must be distinct (raises DuplicateSignatureError otherwise).
    """
    sigs = np.ascontiguousarray(sigs, dtype=np.int64)
    n = len(sigs)
    if settings is None:
        settings = get_settings(leaf_size)
    if n == 0:
        return MPHFDescriptor(
            leaf_size, avg_bucket_size, salt, 0, 0,
            np.zeros(1, np.int64), np.zeros(1, np.int64), b"",
            rule_gen=settings.rule_gen,
        )
    blog2 = bucket_log2_for(n, avg_bucket_size)
    bc = 1 << blog2
    bids = _bucket_of(sigs, blog2)
    order = np.argsort(bids, kind="stable")
    uniq, n_keys, _bits, byte_lens_u, blob = build_buckets(
        bids[order], sigs[order], settings
    )
    sizes = np.zeros(bc, dtype=np.int64)
    sizes[uniq] = n_keys
    byte_lens = np.zeros(bc, dtype=np.int64)
    byte_lens[uniq] = byte_lens_u
    offsets = np.zeros(bc + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    byte_starts = np.zeros(bc + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=byte_starts[1:])
    return MPHFDescriptor(
        leaf_size, avg_bucket_size, salt, n, blog2, offsets, byte_starts, blob,
        rule_gen=settings.rule_gen,
    )


@dataclass
class MPHFDescriptor:
    """Serialized minimal-perfect-hash descriptor + vectorized evaluator."""

    leaf_size: int
    avg_bucket_size: int
    salt: int
    n: int
    bucket_log2: int
    offsets: np.ndarray  # (bc+1,) int64 cumulative key counts
    byte_starts: np.ndarray  # (bc+1,) int64 cumulative stream byte offsets
    stream: bytes
    #: 0 = keys hashed as strings (universal), 1 = native long keys (no
    #: per-row string allocation JVM-side; ~30% less GC pressure at build)
    key_mode: int = 0
    #: split-rule generation the streams were encoded under (settings.py
    #: RULE_GEN): evaluate re-derives the rule table, so this IS part of
    #: the format — a v3 descriptor decodes with generation 0. The default
    #: tracks RULE_GEN so a future generation bump cannot leave Spark-built
    #: descriptors stamped with a stale literal (review finding)
    rule_gen: int = RULE_GEN

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        sizes = np.diff(self.offsets)
        blens = np.diff(self.byte_starts)
        mean_size = int(round(sizes.mean())) if len(sizes) else 0
        # alpha = global stream bytes per key: predicts each bucket's byte
        # length from its (already decoded) size; residuals are tiny folded
        # deltas. Stored as f64 so floor(alpha*size) replays identically.
        alpha = len(self.stream) / self.n if self.n else 0.0
        enc_sizes = rice_split_encode(zigzag(sizes - mean_size))
        pred = np.floor(alpha * sizes).astype(np.int64)
        enc_blens = rice_split_encode(zigzag(blens - pred))
        head = _HDR.pack(
            _MAGIC,
            _VERSION,
            self.leaf_size,
            self.bucket_log2,
            self.key_mode,
            self.n,
            self.salt,
            self.avg_bucket_size,
            mean_size,
            alpha,
        )
        return (
            head
            + struct.pack("<B", self.rule_gen)
            + struct.pack("<I", len(enc_sizes))
            + enc_sizes
            + struct.pack("<I", len(enc_blens))
            + enc_blens
            + self.stream
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "MPHFDescriptor":
        magic, ver, leaf, blog2, key_mode, n, salt, avg, mean_size, alpha = (
            _HDR.unpack_from(data, 0)
        )
        if magic != _MAGIC or ver not in (3, _VERSION):
            raise ValueError("bad descriptor header")
        if key_mode not in (0, 1):
            raise ValueError(f"unknown key_mode {key_mode}")
        off = _HDR.size
        if ver == 3:
            # rounds 1-2: uniform time weight for every leaf size. (Known
            # hole: leaf>=10 descriptors serialized in the brief dev window
            # where the per-leaf rule existed but the header was still v3
            # are byte-indistinguishable from gen-0 and unsupported; none
            # were persisted outside throwaway test dirs.)
            rule_gen = 0
        else:
            (rule_gen,) = struct.unpack_from("<B", data, off)
            off += 1
        if rule_gen not in (0, 1, 2, 3):
            raise ValueError(f"unknown rule generation {rule_gen}")
        (l1,) = struct.unpack_from("<I", data, off)
        off += 4
        sizes = unzigzag(rice_split_decode(data[off : off + l1])) + mean_size
        off += l1
        (l2,) = struct.unpack_from("<I", data, off)
        off += 4
        pred = np.floor(alpha * sizes).astype(np.int64)
        blens = unzigzag(rice_split_decode(data[off : off + l2])) + pred
        off += l2
        bc = len(sizes)
        offsets = np.zeros(bc + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        byte_starts = np.zeros(bc + 1, dtype=np.int64)
        np.cumsum(blens, out=byte_starts[1:])
        return cls(
            leaf, avg, salt, n, blog2, offsets, byte_starts, data[off:],
            key_mode, rule_gen,
        )

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.to_bytes())

    @classmethod
    def load(cls, path: str) -> "MPHFDescriptor":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    # -- stats --------------------------------------------------------------
    @property
    def total_bits(self) -> int:
        return 8 * len(self.to_bytes())

    @property
    def bits_per_key(self) -> float:
        return self.total_bits / max(1, self.n)

    @property
    def settings(self) -> Settings:
        return get_settings(self.leaf_size, self.rule_gen)

    # -- evaluation ----------------------------------------------------------
    def _evaluator(self):
        """Lazy per-process VectorEvaluator (decoded trees cached)."""
        ve = getattr(self, "_ve", None)
        if ve is None:
            from .evaluate import VectorEvaluator

            ve = VectorEvaluator(
                self.settings,
                self.bucket_log2,
                self.offsets,
                self.byte_starts,
                self.stream,
            )
            object.__setattr__(self, "_ve", ve)
        return ve

    def _broadcast_evaluator(self, spark):
        """Broadcast of the decoded evaluator, memoized per Spark app.

        ``evaluate``/``register_sql`` used to broadcast afresh on every
        call: the decoded codes table (the dominant payload, ~2.3
        bytes/key) was re-pickled driver-side and re-unpickled by every
        Python worker each time. One descriptor evaluated repeatedly —
        the steady-state serving pattern — now ships it once; PySpark's
        worker-side broadcast registry then caches the unpickled value
        across tasks for reused workers. Keyed by applicationId so a
        stopped/restarted session transparently re-broadcasts."""
        sc = spark.sparkContext
        app = sc.applicationId
        cached = getattr(self, "_ve_bcast", None)
        if cached is not None and cached[0] == app:
            return cached[1]
        b = sc.broadcast(self._evaluator())
        object.__setattr__(self, "_ve_bcast", (app, b))
        return b

    def evaluate_array(self, sigs: np.ndarray) -> np.ndarray:
        """MPHF indices for int64 signatures (vectorized wavefront walk,
        see ``evaluate.VectorEvaluator``).

        Keys must have been hashed with this descriptor's salt. Results for
        non-member keys are unspecified (standard MPHF contract,
        ``simple/recsplit.md:51-54``).
        """
        sigs = np.ascontiguousarray(sigs, dtype=np.int64)
        if self.n == 0 or len(sigs) == 0:
            return np.zeros(len(sigs), dtype=np.int64)
        return self._evaluator().evaluate(sigs)

    def evaluate(
        self,
        df,
        key_col: str,
        out_col: str = "mphf_index",
        coalesce: int | str | None = None,
    ):
        """Append the MPHF index column to a DataFrame.

        JVM-side ``xxhash64`` recomputes the signature; a scalar Arrow UDF
        does the bucket-grouped tree walk (reference:
        ``RecSplitEvaluator.evaluate``, broadcast-join pattern of SURVEY
        §3.2). The Rice streams are decoded ONCE on the driver and the
        decoded evaluator (flat trial-index array, ~2.3 bytes/key) is what
        gets broadcast — N executors re-decoding the same descriptor was
        measured DRAM-latency-bound once the stream outgrew L2. Beyond
        ~10^8 keys use BlockedMPHF (per-block streams stay cache-sized).

        ``arrow_udf`` (not ``pandas_udf``): the walk reads/writes plain
        int64 arrays, so the pandas Series construction on both sides of
        the old plumbing was pure tax (round-2 control experiment; in
        degraded-bandwidth windows it measured 2x end-to-end). The index
        crosses back as int32 when n fits (75% of the round-trip payload
        is the outbound sigs; the return leg halves) and is cast to long
        JVM-side, so the output schema is unchanged.

        ``coalesce``: partition-count discipline for the Arrow stage. The
        walk itself is no longer the limiter (225 ns/key single-core);
        the residual end-to-end cost is PER-TASK Arrow transport overhead,
        so many small partitions lose to few large ones (round-3
        controls: 16M keys at 48 partitions beat 128 by 1.6x on 32
        cores). ``'auto'`` coalesces to ~1.5 tasks per core
        (``max(2, 3 * defaultParallelism // 2)``), an int coalesces to
        that count, ``None`` (default) leaves partitioning alone.
        ``coalesce`` is a NARROW dependency — no shuffle is introduced —
        and it never increases the partition count, so already-coarse
        inputs pass through unchanged.
        """
        from pyspark.sql import functions as F
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import IntegerType, LongType

        if self.n == 0:  # empty key set: any result is unspecified
            return df.withColumn(out_col, F.lit(0).cast("long"))
        spark = df.sparkSession
        if coalesce == "auto":
            coalesce = max(2, (3 * spark.sparkContext.defaultParallelism) // 2)
        if coalesce is not None:
            df = df.coalesce(int(coalesce))
        bcast = self._broadcast_evaluator(spark)
        narrow = self.n <= (1 << 31)

        if narrow:

            @arrow_udf(IntegerType())
            def _mphf_eval(sig: pa.Array) -> pa.Array:
                sigs = np.ascontiguousarray(
                    sig.to_numpy(zero_copy_only=False), dtype=np.int64
                )
                out = bcast.value.evaluate(sigs)
                return pa.array(out.astype(np.int32), type=pa.int32())

        else:

            @arrow_udf(LongType())
            def _mphf_eval(sig: pa.Array) -> pa.Array:
                sigs = np.ascontiguousarray(
                    sig.to_numpy(zero_copy_only=False), dtype=np.int64
                )
                return pa.array(bcast.value.evaluate(sigs), type=pa.int64())

        return df.withColumn(
            out_col,
            _mphf_eval(key_sig_expr(key_col, self.salt, self.key_mode)).cast("long"),
        )

    def register_sql(self, spark, name: str = "mphf_eval") -> None:
        """Expose evaluation as a Spark SQL scalar function ``<name>(key)``.

        Two-layer registration keeps the plan shape identical to
        ``evaluate``: the raw key is hashed JVM-side inside a SQL UDF
        wrapper (``xxhash64(cast(key), salt)`` — no Python touches raw
        keys), which forwards the signature to a registered Arrow UDF
        over the broadcast decoded evaluator. Like ``evaluate``, the index
        crosses back from Python as int32 when n fits 2^31 (the return
        leg halves) and the SQL wrapper casts it to BIGINT, so the
        function's result type is stable either way. After this,
        ``SELECT <name>(doc_id) FROM t`` works anywhere SQL does."""
        import numpy as np
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import IntegerType, LongType

        bcast = self._broadcast_evaluator(spark)
        narrow = self.n <= (1 << 31)

        if narrow:

            @arrow_udf(IntegerType())
            def _walk(sig: pa.Array) -> pa.Array:
                sigs = np.ascontiguousarray(
                    sig.to_numpy(zero_copy_only=False), dtype=np.int64
                )
                out = bcast.value.evaluate(sigs)
                return pa.array(out.astype(np.int32), type=pa.int32())

        else:

            @arrow_udf(LongType())
            def _walk(sig: pa.Array) -> pa.Array:
                sigs = np.ascontiguousarray(
                    sig.to_numpy(zero_copy_only=False), dtype=np.int64
                )
                return pa.array(bcast.value.evaluate(sigs), type=pa.int64())

        spark.udf.register(f"_{name}_walk", _walk)
        cast = "BIGINT" if self.key_mode == 1 else "STRING"
        arg = "CAST(k AS BIGINT)" if self.key_mode == 1 else "CAST(k AS STRING)"
        # xxhash64 hashes the salt as an input COLUMN, so its SQL type is
        # part of the signature: F.lit(int) is INT when it fits 32 bits —
        # the SQL literal must match or every hash differs
        salt_lit = (
            str(self.salt)
            if -(2**31) <= self.salt < 2**31
            else f"{self.salt}L"
        )
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(k {cast})"
            f" RETURNS BIGINT RETURN "
            f"CAST(_{name}_walk(xxhash64({arg}, {salt_lit})) AS BIGINT)"
        )


_BLOCK_SCHEMA = (
    "part_first_bucket long, min_bucket long, max_bucket long, "
    "n_keys_total long, build_ns long, bucket_ids array<long>, "
    "n_keys array<long>, byte_lens array<long>, blob binary"
)


def _range_membership_udf(spark, ranges: list[tuple[int, int]]):
    """Boolean Column fn: is ``bucket`` inside any committed [lo, hi] range?

    The committed checkpoint is a list of disjoint bucket RANGES (one per
    kernel partition), so resume membership is an interval lookup. The
    round-2 version OR-chained per-range predicates — at thousands of
    ranges the Catalyst expression tree gets deep (planner blowup) and
    evaluation is O(ranges) per row; a broadcast nested-loop anti-join has
    the same O(ranges)-per-row cost. Spark has no searchsorted builtin, so
    the lookup rides a vectorized Arrow UDF over broadcast sorted bounds:
    O(log ranges) per key, flat plan at any range count, and only the
    bucket column crosses into Python.

    Committed spans can OVERLAP: a resume's rebuild partitions span
    contiguous ranges of the *remaining* buckets, so their [min, max] can
    straddle already-committed holes (every bucket inside such a span is
    covered by either the new or an earlier span — union semantics, which
    the old OR-chain implemented implicitly). The binary search requires
    disjoint intervals, so spans are union-merged first; skipping this
    made a second resume misclassify buckets inside straddled spans as
    uncovered and double-build them (caught in review)."""
    from pyspark.sql.functions import arrow_udf
    from pyspark.sql.types import BooleanType

    los: list[int] = []
    his: list[int] = []
    for lo, hi in sorted(ranges):
        if los and lo <= his[-1]:
            his[-1] = max(his[-1], hi)
        else:
            los.append(lo)
            his.append(hi)
    bcast = spark.sparkContext.broadcast((
        np.array(los, dtype=np.int64),
        np.array(his, dtype=np.int64),
    ))

    @arrow_udf(BooleanType())
    def _in_done(bucket: pa.Array) -> pa.Array:
        los, his = bcast.value
        b = bucket.to_numpy(zero_copy_only=False)
        j = np.searchsorted(los, b, side="right") - 1
        hit = (j >= 0) & (b <= his[np.maximum(j, 0)])
        return pa.array(hit)

    return _in_done


def _space_priority_gen(space_priority: bool | str) -> int:
    """Map the builder's ``space_priority`` flag to a rule generation:
    False -> the default generation, True -> 2, "max" -> 3. Shared by
    RecSplitBuilder and BlockedMPHFBuilder so the flag means the same
    thing everywhere."""
    if space_priority is False:
        return RULE_GEN
    if space_priority is True:
        return 2
    if space_priority == "max":
        return 3
    raise ValueError(
        f"space_priority must be False, True, or 'max', got {space_priority!r}"
    )


def _make_kernel(leaf_size: int, avg_bucket_size: int, rule_gen: int = RULE_GEN):
    """Partition kernel closure. The Settings rule table is derived ONCE on
    the driver and shipped inside the closure (plain lists pickle fast);
    workers skip the DP entirely unless an oversized bucket forces growth."""
    settings = get_settings(leaf_size, rule_gen)
    settings.ensure(4 * avg_bucket_size + 256)

    def _kernel(batches):
        t0 = time.time_ns()
        chunks = list(batches)
        if not chunks:
            return
        bids = np.concatenate([c["bucket"].to_numpy() for c in chunks])
        sigs = np.concatenate([c["sig"].to_numpy() for c in chunks])
        order = np.argsort(bids, kind="stable")
        bids, sigs = bids[order], sigs[order]
        uniq, n_keys, _bits, byte_lens, blob = build_buckets(bids, sigs, settings)
        yield pd.DataFrame(
            {
                "part_first_bucket": [int(uniq[0])],
                "min_bucket": [int(uniq[0])],
                "max_bucket": [int(uniq[-1])],
                "n_keys_total": [int(n_keys.sum())],
                "build_ns": [time.time_ns() - t0],
                "bucket_ids": [uniq.tolist()],
                "n_keys": [n_keys.tolist()],
                "byte_lens": [byte_lens.tolist()],
                "blob": [blob],
            }
        )

    return _kernel


class RecSplitBuilder:
    """Distributed MPHF construction (reference: ``RecSplitBuilder``).

    Parameters mirror the reference: ``leaf_size`` (1..20 practical),
    ``avg_bucket_size`` (4..4096). ``partitions`` bounds kernel parallelism
    (default: 2x the cluster's default parallelism). ``checkpoint_dir``
    enables resumable builds: per-partition results (bucket-range blocks)
    are persisted as parquet with lineage and reused on re-run.
    """

    def __init__(
        self,
        leaf_size: int = 8,
        avg_bucket_size: int = 128,
        salt: int = 0,
        partitions: int | None = None,
        checkpoint_dir: str | None = None,
        max_salt_retries: int = 4,
        space_priority: bool | str = False,
    ) -> None:
        if not (1 <= leaf_size <= 20):
            raise ValueError("leaf_size must be in [1, 20]")
        if not (4 <= avg_bucket_size <= 4096):
            raise ValueError("avg_bucket_size must be in [4, 4096]")
        self.leaf_size = leaf_size
        self.avg_bucket_size = avg_bucket_size
        self.salt = salt
        self.partitions = partitions
        self.checkpoint_dir = checkpoint_dir
        self.max_salt_retries = max_salt_retries
        # space_priority=True = rule generation 2 (SPACE_TIME_WEIGHT): at
        # leaf 12/256, 0.049 tree-bits/key smaller than the default rule
        # for 4.8x the kernel work. space_priority="max" = generation 3
        # (GEN3_TIME_WEIGHT + raised trial cap): the reference's extreme-
        # space regime — 1.5772 tree-bits/key at leaf 14/512 for ~27x the
        # gen-2 work. Both opt-in because build time is the usual
        # constraint; descriptors record the generation, so all kinds
        # evaluate interchangeably
        self.rule_gen = _space_priority_gen(space_priority)

    # -- public -------------------------------------------------------------
    def build(self, df, key_col: str, n: int | None = None) -> MPHFDescriptor:
        """Construct the MPHF over the keys of ``df[key_col]``.

        Keys must be distinct (duplicates fail the build after salt
        retries, like the reference's checkDuplicateKey). ``n`` skips the
        count job when the caller already knows the key count — at scale
        that saves one full scan; only the bucket count depends on it
        (approximation is tolerated; minimality is enforced from the
        actual kernel outputs at finalize).
        """
        from pyspark.sql import functions as F

        key_mode = key_mode_for(df, key_col)
        cast_t = "long" if key_mode == 1 else "string"
        keys = df.select(F.col(key_col).cast(cast_t).alias("__key"))
        if n is None:
            n = keys.count()
        if n == 0:
            return MPHFDescriptor(
                self.leaf_size, self.avg_bucket_size, self.salt, 0, 0,
                np.zeros(1, np.int64), np.zeros(1, np.int64), b"", key_mode,
                rule_gen=self.rule_gen,
            )
        salt = self.salt
        last_err: Exception | None = None
        for _attempt in range(self.max_salt_retries):
            try:
                return self._build_once(keys, n, salt, key_mode)
            except Exception as e:  # noqa: BLE001 — executor errors arrive as strings
                msg = str(e)
                if "duplicate 64-bit signature" in msg or "search exceeded" in msg:
                    last_err = e
                    salt += 1  # salt re-roll (north rule; Generator.java:465-469)
                    continue
                raise
        raise RuntimeError(
            f"MPHF build failed after {self.max_salt_retries} salt re-rolls "
            f"(duplicate keys in input?): {last_err}"
        )

    # -- internals ------------------------------------------------------------
    def _bucket_log2(self, n: int) -> int:
        import math

        target = max(1, round(n / self.avg_bucket_size))
        return max(0, math.ceil(math.log2(target)))

    def _build_once(self, keys, n: int, salt: int, key_mode: int) -> MPHFDescriptor:
        from pyspark.sql import functions as F

        spark = keys.sparkSession
        blog2 = self._bucket_log2(n)
        bc = 1 << blog2
        # 2x parallelism: straggler smoothing (bucket-size variance makes
        # per-partition kernel time uneven) without per-task overhead
        # dominating — measured best at 32 cores vs 1x (stragglers) and 4x
        # (task/Arrow fixed costs). Floored at ~32k keys per kernel task:
        # below that the per-task fixed cost IS the build (457k keys at 64
        # partitions measured 1.9 s vs 1.1 s at 8 — stragglers are moot
        # when every kernel runs tens of ms); at large n the floor never
        # binds (16M keys -> 488 >> 64).
        nparts = self.partitions or max(
            1,
            min(2 * spark.sparkContext.defaultParallelism, max(1, n // 32768)),
        )
        nparts = min(nparts, bc)

        sig = F.xxhash64(F.col("__key"), F.lit(salt))
        sig_df = keys.select(sig.alias("sig"))
        if blog2 == 0:
            bucket_expr = F.lit(0).cast("long")
        else:
            bucket_expr = F.shiftrightunsigned(F.col("sig"), 64 - blog2)

        kernel = _make_kernel(self.leaf_size, self.avg_bucket_size, self.rule_gen)
        if self.checkpoint_dir:
            # checkpointed builds keep RANGE partitioning: resume
            # membership is interval arithmetic over each block's
            # [min_bucket, max_bucket], which requires partitions to be
            # contiguous bucket ranges. Partition-local bucket order is
            # irrelevant either way — the kernel groups by bucket itself
            # (np.argsort on the batch).
            sig_df = sig_df.withColumn("bucket", bucket_expr)
            parted = sig_df.repartitionByRange(nparts, "bucket")
            blocks_df = parted.mapInPandas(kernel, schema=_BLOCK_SCHEMA)
            rows = self._run_with_checkpoint(spark, blocks_df, sig_df, salt, blog2)
        else:
            # plain builds HASH-partition on the bucket id (round 6):
            # _finalize scatters per bucket, so the only invariant is
            # whole-bucket colocation, not range contiguity — and hash
            # partitioning drops repartitionByRange's boundary-sampling
            # pass (a full extra scan computing xxhash64 over the input).
            # Bucket ids are top bits of xxhash64, so with bc >> nparts
            # (bc = n/avg_bucket_size, nparts <= 2x cores) the hash
            # spreads partitions evenly. The shuffle also carries ONLY
            # the 8-byte sig — the bucket column is recomputed from it
            # after the exchange (guide: shuffle fewer bytes).
            parted = sig_df.repartition(nparts, bucket_expr).withColumn(
                "bucket", bucket_expr
            )
            blocks_df = parted.mapInPandas(kernel, schema=_BLOCK_SCHEMA)
            rows = blocks_df.collect()
        return self._finalize(rows, n, salt, blog2, key_mode)

    def _check_or_write_manifest(self, spark, blog2: int) -> None:
        """Pin (leaf_size, avg_bucket_size, rule_gen, blog2) at first commit
        under the checkpoint path; raise on resume mismatch.

        The committed blocks are Rice streams encoded under a specific rule
        table: resuming with a different ``leaf_size`` (same bucket
        geometry), or resuming a checkpoint whose blobs were encoded under
        an older rule generation, would merge incompatible blobs with newly
        built ones — key-count and stream-length checks still pass, so the
        descriptor silently misdecodes (non-bijective). Same failure class
        the sketch CheckpointedBuild manifest closes
        (``sketches/checkpoint.py:_check_or_write_manifest``); ``blog2``
        additionally pins the bucket geometry, so a changed input size or
        ``avg_bucket_size`` fails loudly instead of scattering blobs at the
        wrong offsets. The manifest lives at ``<dir>/_manifest`` (the
        underscore keeps Hadoop/Spark file listings from treating it as
        data under a future recursive read)."""
        rule_gen = self.rule_gen
        mpath = f"{self.checkpoint_dir}/_manifest"
        try:
            row = spark.read.parquet(mpath).collect()[0]
        except Exception:  # noqa: BLE001 — no readable manifest
            # A missing manifest is only a FIRST run if no salt=* blocks
            # are committed yet: adopting pre-manifest blocks under the
            # resume's settings is exactly the hole the manifest closes.
            if self._has_committed_blocks(spark):
                raise ValueError(
                    f"checkpoint at {self.checkpoint_dir} has committed "
                    "blocks but no readable manifest (pre-manifest "
                    "checkpoint or corrupt manifest); re-run against a "
                    "fresh path, or restore the manifest recording the "
                    "original leaf_size/avg_bucket_size/rule_gen/blog2"
                ) from None
            spark.createDataFrame(
                [(self.leaf_size, self.avg_bucket_size, rule_gen, blog2)],
                "leaf_size int, avg_bucket_size int, rule_gen int, blog2 int",
            ).write.mode("overwrite").parquet(mpath)
            return
        want = (self.leaf_size, self.avg_bucket_size, rule_gen, blog2)
        got = (
            int(row["leaf_size"]), int(row["avg_bucket_size"]),
            int(row["rule_gen"]), int(row["blog2"]),
        )
        if got != want:
            raise ValueError(
                "MPHF checkpoint manifest mismatch: committed build used "
                f"(leaf_size, avg_bucket_size, rule_gen, blog2)={got}, "
                f"resume requested {want}; resume with the original "
                "settings or use a fresh path"
            )

    def _has_committed_blocks(self, spark) -> bool:
        """True if any ``salt=*`` block dir under the checkpoint path holds
        data (Hadoop FS listing, so it works on any supported filesystem)."""
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self.checkpoint_dir)
        try:
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(hpath):
                return False
            for st in fs.listStatus(hpath):
                name = st.getPath().getName()
                if st.isDirectory() and name.startswith("salt="):
                    if fs.listStatus(st.getPath()):
                        return True
            return False
        except Exception:  # noqa: BLE001 — unlistable path: treat as empty
            return False

    def _run_with_checkpoint(self, spark, blocks_df, sig_df, salt, blog2):
        """Resume-aware execution: completed bucket ranges are read from the
        checkpoint parquet; only missing ranges are rebuilt (reference
        analogue: the restartable HEM block loop, ``HemGenerator.java:48-70``).
        """
        from pyspark.sql import functions as F

        self._check_or_write_manifest(spark, blog2)
        path = f"{self.checkpoint_dir}/salt={salt}"
        done_ranges: list[tuple[int, int]] = []
        try:
            existing = spark.read.parquet(path)
            done_ranges = [
                (r["min_bucket"], r["max_bucket"])
                for r in existing.select("min_bucket", "max_bucket").collect()
            ]
        except Exception:  # noqa: BLE001 — no checkpoint yet
            pass
        if done_ranges:
            remaining = sig_df.filter(
                ~_range_membership_udf(spark, done_ranges)(F.col("bucket"))
            )
            if remaining.limit(1).count() > 0:
                # rebuild only missing ranges, preserving the kernel chain
                rebuilt = self._rebuild_blocks(remaining, salt)
                rebuilt.write.mode("append").parquet(path)
        else:
            blocks_df.write.mode("append").parquet(path)
        final = spark.read.parquet(path)
        rows = final.collect()
        # de-duplicate ranges if a retry double-wrote (first wins)
        seen: set[int] = set()
        uniq_rows = []
        for r in sorted(rows, key=lambda r: r["min_bucket"]):
            if r["min_bucket"] not in seen:
                seen.add(r["min_bucket"])
                uniq_rows.append(r)
        return uniq_rows

    def _rebuild_blocks(self, remaining_sig_df, salt):
        """Re-run the kernel over the remaining (not-yet-checkpointed) keys."""
        kernel = _make_kernel(self.leaf_size, self.avg_bucket_size, self.rule_gen)
        nparts = max(1, remaining_sig_df.sparkSession.sparkContext.defaultParallelism)
        return remaining_sig_df.repartitionByRange(nparts, "bucket").mapInPandas(
            kernel, schema=_BLOCK_SCHEMA
        )

    def _finalize(
        self, rows, n: int, salt: int, blog2: int, key_mode: int = 0
    ) -> MPHFDescriptor:
        """Associative merge: scatter per-bucket (n_keys, byte_len) into
        dense arrays, recompute prefix sums, and scatter each row's blob
        into the global stream AT ITS BUCKETS' OFFSETS (M1-M3 of SURVEY
        §2.4 — order-independent by construction).

        The scatter (not a sorted concatenation) matters on resume: a
        rebuild partition spans contiguous ranges of the REMAINING
        buckets, so one committed row's blob can hold several
        NON-ADJACENT bucket bands laid out back-to-back — a min_bucket-
        sorted blob join would interleave other rows' bands at the wrong
        offsets while both the key-count and stream-length checks still
        pass (silently non-bijective; review finding). Each row is copied
        as runs of consecutive bucket ids — global offsets within such a
        run are contiguous by construction — so the normal no-resume case
        stays one memcpy per row."""
        bc = 1 << blog2
        sizes = np.zeros(bc, dtype=np.int64)
        byte_lens = np.zeros(bc, dtype=np.int64)
        total_keys = 0
        for r in rows:
            bids = np.asarray(r["bucket_ids"], dtype=np.int64)
            sizes[bids] = np.asarray(r["n_keys"], dtype=np.int64)
            byte_lens[bids] = np.asarray(r["byte_lens"], dtype=np.int64)
            total_keys += int(r["n_keys_total"])
        if total_keys != n:
            raise RuntimeError(
                f"bucket merge lost keys: {total_keys} != {n} (corrupt checkpoint?)"
            )
        offsets = np.zeros(bc + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        byte_starts = np.zeros(bc + 1, dtype=np.int64)
        np.cumsum(byte_lens, out=byte_starts[1:])
        buf = bytearray(int(byte_starts[-1]))
        written = 0
        for r in rows:
            bids = np.asarray(r["bucket_ids"], dtype=np.int64)
            blens = np.asarray(r["byte_lens"], dtype=np.int64)
            local = np.zeros(len(bids) + 1, dtype=np.int64)
            np.cumsum(blens, out=local[1:])
            blob = bytes(r["blob"])
            breaks = np.flatnonzero(np.diff(bids) != 1) + 1
            run_lo = np.concatenate([[0], breaks])
            run_hi = np.concatenate([breaks, [len(bids)]])
            for s_i, e_i in zip(run_lo, run_hi):
                g0 = int(byte_starts[bids[s_i]])
                lo, hi = int(local[s_i]), int(local[e_i])
                buf[g0 : g0 + (hi - lo)] = blob[lo:hi]
                written += hi - lo
        stream = bytes(buf)
        if written != len(stream):
            raise RuntimeError("stream length mismatch during merge")
        return MPHFDescriptor(
            self.leaf_size,
            self.avg_bucket_size,
            salt,
            n,
            blog2,
            offsets,
            byte_starts,
            stream,
            key_mode,
            rule_gen=self.rule_gen,
        )
