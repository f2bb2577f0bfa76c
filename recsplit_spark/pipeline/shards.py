"""Training-shard output + deterministic epoch ordering — the
dataloader-facing last mile after ``packing``/``mixing``/``splits``.

Shard assignment is VALUE-defined (``pmod(xxhash64(id), n_shards)``),
never placement-defined: the same row lands in the same shard on every
run, cluster size, and input partitioning — the same determinism
contract as ``packing``'s group assignment (repartition placement
drifts run-to-run; sampled range boundaries drift with input order).
A re-run therefore writes byte-stable shard MEMBERSHIP, which is what
makes downstream dataloaders, resume-from-shard-k training, and audit
diffs possible.

Epoch ordering is the other half: training wants a different but
REPRODUCIBLE permutation per epoch. ``epoch_order`` keys a sort on
``xxhash64(id, epoch)``. The global variant is a pure function of
(ids, epoch) — any worker, any restart, any re-run sees the same total
order — at the cost of one range exchange (a real cost at 100 TB — it
IS the shuffle). ``scope='shard'`` permutes within partitions with
ZERO exchange on a shard-partitioned frame, the standard large-scale
compromise (shard-local shuffle + shard-order rotation); its order is
pure per partition, while row-to-partition grouping follows the read's
file packing (see ``epoch_order``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def shard_col(id_col: str, n_shards: int, salt: str = "shard"):
    """The shard-assignment expression: ``pmod(xxhash64(salt, id), S)``.
    Exposed so readers/auditors can recompute membership in-engine."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    return F.pmod(F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(n_shards))


def with_shard(df, id_col: str, n_shards: int, salt: str = "shard",
               out_col: str = "shard"):
    """Add the value-defined shard id column (no shuffle — a projection)."""
    return df.withColumn(out_col, shard_col(id_col, n_shards, salt))


def write_training_shards(df, path: str, id_col: str, n_shards: int,
                          salt: str = "shard", mode: str = "error",
                          sort_in_shard: bool = True) -> None:
    """Write ``<path>/shard=K/`` parquet dirs with value-defined
    membership and (by default) id-sorted rows within each shard — a
    deterministic-CONTENT layout a re-run reproduces (membership is the
    column value, row order the in-shard sort; which task writes which
    shard may drift, the bytes' meaning doesn't). One exchange — range
    placement on the shard value, which keeps a shard's rows in one
    task and spreads the S values ~1:1 over S tasks (hash placement
    collides: measured 64 values into 41 of 64 tasks, a 4x straggler).
    Range placement samples the child plan to pick boundaries — one
    extra evaluation of the input; persist upstream if it is expensive
    to recompute. One file per shard dir. Hive-partitioned on
    ``shard`` so a dataloader reading shard K is a partition-pruned
    scan."""
    out = with_shard(df, id_col, n_shards, salt)
    out = out.repartitionByRange(n_shards, "shard")
    if sort_in_shard:
        out = out.sortWithinPartitions("shard", id_col)
    out.write.mode(mode).partitionBy("shard").parquet(path)


def read_training_shards(spark, path: str, shards=None):
    """Read shard output; ``shards=[...]`` prunes to those partitions
    (PartitionFilter — unselected shard dirs are never opened)."""
    df = spark.read.option("basePath", path).parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def epoch_key(id_col: str, epoch: int, salt: str = "epoch"):
    """The per-epoch permutation key: ``xxhash64(salt, epoch, id)``."""
    return F.xxhash64(F.lit(salt), F.lit(int(epoch)), F.col(id_col))


def epoch_order(df, id_col: str, epoch: int, salt: str = "epoch",
                scope: str = "global"):
    """Deterministic epoch-e permutation of a training frame.

    ``scope='global'``: one range exchange — the true global shuffle;
    every epoch is a full permutation of the corpus. ``scope='shard'``:
    ``sortWithinPartitions`` only — zero exchange on a frame already
    partitioned by shard (``read_training_shards`` output read as-is,
    or anything after a shard repartition); the permutation is
    shard-local, so pair it with epoch-rotated shard read ORDER in the
    dataloader for cross-shard variety. Purity: ``global`` is a pure
    function of (ids, epoch) — any worker, restart, or re-run replays
    the same total order. ``shard`` is pure PER PARTITION (each
    partition's rows are totally ordered by the epoch key), but which
    rows share a partition follows the read's file-to-partition
    packing — reproducible only under the same files and scan config;
    treat its guarantee as per-shard-file order, not a global
    sequence."""
    k = epoch_key(id_col, epoch, salt)
    if scope == "global":
        return df.orderBy(k, F.col(id_col))
    if scope == "shard":
        return df.sortWithinPartitions(k, F.col(id_col))
    raise ValueError(f"scope must be 'global' or 'shard', got {scope!r}")
