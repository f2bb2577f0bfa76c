"""Input sources for the sequences table (BASELINE.json input_hint).

The production input is an Iceberg table of pre-tokenized training
sequences ``(doc_id:string, tokens:array<int32>, n_tok:int32,
source:string)``. Iceberg rides entirely on Spark's catalog API — no code
here depends on it beyond ``spark.table`` — so the same call works for
parquet directories (this sandbox), Hive tables, or Iceberg:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=rest ... \
      job.py --input lake.db.sequences

Iceberg specifics we rely on (all free via Catalyst): column pruning to
``doc_id`` for MPHF builds, partition pruning on ``source`` filters,
snapshot isolation for resumable builds (a re-run reads the same snapshot
→ byte-identical descriptor), and hidden-partitioning so the bucket
shuffle is the ONLY data movement.
"""

from __future__ import annotations

SEQUENCES_FIELDS = {
    "doc_id": "string",
    "tokens": "array<int>",
    "n_tok": "int",
    "source": "string",
}


def read_sequences(spark, source: str, validate: bool = True):
    """Load the sequences table from a parquet path or a catalog/Iceberg
    table name. ``validate`` checks the input_hint schema contract."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.table(source)
    if validate:
        have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        missing = {
            k: v for k, v in SEQUENCES_FIELDS.items() if have.get(k) != v
        }
        if missing:
            raise ValueError(
                f"sequences schema mismatch: expected {missing}, have "
                f"{ {k: have.get(k) for k in missing} }"
            )
    return df


def write_sequences(df, path: str, mode: str = "error") -> None:
    """Write a sequences DataFrame (parquet; Iceberg via ``writeTo`` when a
    catalog is configured)."""
    df.write.mode(mode).parquet(path)
