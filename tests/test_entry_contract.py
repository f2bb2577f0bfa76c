"""Self-check of the driver contract: every queries() result must match its
oracle_sql() DuckDB result (row count + column names + order-insensitive
values), emulating the driver's comparison."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows, cols):
    """Order-insensitive canonical form, columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if math.isfinite(v) else str(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    r = rows[0]
    assert r["n_keys"] == r["distinct_idx"] and r["min_idx"] == 0
    assert r["max_idx"] == r["n_keys"] - 1
    assert 1.44 <= r["bits_per_key"] <= 2.3


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0
        return
    ores = ddb.execute(sql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows)
    assert _norm(srows, scols) == _norm(orows, ocols)
