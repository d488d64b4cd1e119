"""Replicates the driver's correctness gate locally: every queries()
entry runs on Spark at sf0.01 and, where an oracle exists, must match
DuckDB on row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(rows, columns):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (floats to 9 significant digits)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()
WITH_ORACLE = sorted(set(ALL_QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLES))


def test_oracle_coverage():
    # every oracle key must have a query
    assert not set(ORACLES) - set(ALL_QUERIES)
    # every query has an oracle (materialized gold covers the
    # non-SQL-expressible ones — rex_spark/oracle_gold.py)
    assert ROWS_ONLY == []


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    canon_s = _canon(spark_rows, spark_cols)
    canon_d = _canon(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(canon_s, canon_d) if a != b
    ]
    assert canon_s == canon_d, f"{name}: first mismatches {mismatches[:3]}"


def test_no_query_emits_nested_columns(spark):
    """The driver's value-hash canonicalizer factorizes cells with
    pandas and cannot handle ARRAY/MAP/STRUCT cells (round-1's only
    red row was exactly this).  Every query must emit atomic columns
    only — stringify nested values at the query surface."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in ALL_QUERIES.items():
        schema = fn(spark, SF_DIR).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"nested output columns would break the driver hash: {bad}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "subj", "pred", "obj"}
