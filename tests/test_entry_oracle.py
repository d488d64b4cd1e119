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
    values TYPE-SENSITIVELY (floats to 9 significant digits, prefixed by
    value class so an int-valued float like 646.0 does NOT collapse to
    the int 646 — the driver's value-hash distinguishes them, and r2's
    only red row was exactly that oracle type drift)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return f"b:{v}"
        if isinstance(v, int):
            return f"i:{v}"
        if isinstance(v, float):
            if math.isnan(v):
                return "f:nan"
            return f"f:{v:.9g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def _type_class(type_name: str) -> str:
    """Canonical type class for a Spark simpleString / Arrow type name,
    so oracle dtype drift (e.g. DuckDB promoting sum(BIGINT) to HUGEINT
    -> decimal128) fails locally before the driver sees it."""
    t = str(type_name).lower()
    if "hugeint" in t or t.startswith("decimal"):
        return "decimal"
    if "timestamp" in t:
        return "ts"
    if "date" in t:
        return "date"
    if t in ("float", "double", "real", "halffloat") or t.startswith("float"):
        return "float"
    if "int" in t:
        return "int"
    if "bool" in t:
        return "bool"
    if "string" in t or "varchar" in t or "utf8" in t:
        return "str"
    return t


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
    spark_types = {f.name: _type_class(f.dataType.simpleString())
                   for f in sdf.schema.fields}
    spark_rows = [tuple(r) for r in sdf.collect()]

    arrow = duck.execute(ORACLES[name]).fetch_arrow_table()
    duck_cols = list(arrow.schema.names)
    duck_types = {f.name: _type_class(f.type) for f in arrow.schema}
    duck_rows = [
        tuple(arrow.column(c)[i].as_py() for c in duck_cols)
        for i in range(arrow.num_rows)
    ]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names"
    assert spark_types == duck_types, f"{name}: result dtype classes"
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
