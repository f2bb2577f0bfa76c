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
