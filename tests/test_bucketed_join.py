"""Bucketing evidence: two tables bucketed on the join key join with
NO shuffle exchange (the co-located-join technique the 100 TB design
relies on for repeated entity/edge joins)."""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    yield
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    edges = spark.range(0, 10_000).selectExpr(
        "id % 997 AS src", "id AS dst", "id % 7 AS w"
    )
    entities = spark.range(0, 997).selectExpr(
        "id AS src", "concat('e', id) AS name"
    )
    (
        edges.write.mode("overwrite")
        .bucketBy(8, "src").sortBy("src")
        .saveAsTable("bktest.edges_b")
    )
    (
        entities.write.mode("overwrite")
        .bucketBy(8, "src").sortBy("src")
        .saveAsTable("bktest.entities_b")
    )
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bktest.edges_b").join(
            spark.table("bktest.entities_b"), "src"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
