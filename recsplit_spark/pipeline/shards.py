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
``xxhash64(id, epoch)`` — epoch e is a pure function of (ids, e), so
any worker, any restart, any re-run sees the same permutation. The
global variant is one range exchange (a real cost at 100 TB — it IS
the shuffle); ``scope='shard'`` permutes within shards with ZERO
exchange on a shard-partitioned frame, the standard large-scale
compromise (shard-local shuffle + shard-order rotation).
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
    fully deterministic layout a re-run reproduces. One exchange
    (repartition on the shard VALUE), one file per shard (each shard is
    one write task). Hive-partitioned on ``shard`` so a dataloader
    reading shard K is a partition-pruned scan."""
    out = with_shard(df, id_col, n_shards, salt)
    out = out.repartition(n_shards, "shard")
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
    or anything after ``repartition(n, 'shard')``); the permutation is
    shard-local, so pair it with epoch-rotated shard read ORDER in the
    dataloader for cross-shard variety. Both are pure functions of
    (ids, epoch): restarts and re-runs replay the same order."""
    k = epoch_key(id_col, epoch, salt)
    if scope == "global":
        return df.orderBy(k, F.col(id_col))
    if scope == "shard":
        return df.sortWithinPartitions(k, F.col(id_col))
    raise ValueError(f"scope must be 'global' or 'shard', got {scope!r}")
