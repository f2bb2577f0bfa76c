"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os
import tempfile
import zipfile


def ship_package(spark) -> None:
    """Make ``recsplit_spark`` importable on executors (addPyFile zip).

    Equivalent to ``spark-submit --py-files recsplit_spark.zip`` — required
    whenever the driver script does not run from the repo root, and on any
    real cluster.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "recsplit_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def ensure_min_partitions(df, target: int | None = None):
    """Scale-adaptive parallelism floor for the Arrow-kernel operators.

    A single-file parquet scan with one row group produces ONE partition
    no matter how many cores the cluster has — Spark cannot split inside
    a row group — and a ``.cache()`` of that scan pins the layout, so
    every downstream ``mapInArrow``/``mapInPandas`` kernel runs as a
    single task (measured: the whole sf1.0 bench corpus fold serialized
    onto one of 32 cores). This floor round-robin-repartitions ONLY when
    the input has fewer partitions than the session's default
    parallelism; at real scale inputs have hundreds-to-millions of
    partitions and it is a provable no-op, so the at-scale plan keeps
    its shuffle-free shape. Streaming frames pass through untouched
    (their micro-batch partitioning is the engine's business).
    """
    if getattr(df, "isStreaming", False):
        return df
    sc = df.sparkSession.sparkContext
    t = int(target) if target else sc.defaultParallelism
    if t <= 1 or df.rdd.getNumPartitions() >= t:
        return df
    return df.repartition(t)


def get_spark(
    app_name: str = "recsplit-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
):
    """Local-mode session tuned for the Arrow-vectorized kernels.

    On a real cluster these settings ride on spark-submit; the ones that
    matter for this engine: Arrow enabled with large batches (the bucket
    kernels amortize across buckets per batch), AQE on (skew handling),
    shuffle partitions sized to cores.
    """
    from pyspark.sql import SparkSession

    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    ncores = os.cpu_count() if cores in ("*",) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * ncores)
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv6Addresses=false")
        .getOrCreate()
    )


def get_spark_with_package(**kwargs):
    """``get_spark`` + ship this package to executors."""
    spark = get_spark(**kwargs)
    ship_package(spark)
    return spark
