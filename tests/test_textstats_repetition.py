"""Gopher-style repetition filter: verdict semantics on planted docs
(the oracle gate pins distributed parity; this pins the thresholds)."""

from pyspark.sql import functions as F

from rex_spark.operators.textstats import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetitive_doc_flagged(spark):
    rows = [
        (1, "spam " * 50),                     # one token dominates
        (2, "alpha beta " * 30),               # 2-gram loop
        (3, "the quick brown fox jumps over a lazy dog near town"),
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(_docs(spark, rows)).collect()
    }
    assert out[1]["repetitive"] and out[1]["top_token_frac"] == 1.0
    assert out[2]["repetitive"] and out[2]["rep_2gram_frac"] > 0.5
    assert not out[3]["repetitive"]
    assert out[3]["top_token_frac"] < 0.2
    assert out[3]["rep_2gram_frac"] == 0.0


def test_single_token_doc_has_zero_gram_frac(spark):
    out = repetition_stats(_docs(spark, [(1, "word")])).collect()[0]
    assert out["n_tokens"] == 1
    assert out["rep_2gram_frac"] == 0.0
    assert out["top_token_frac"] == 1.0  # trivially dominant -> flagged
    assert out["repetitive"]


def test_plan_has_partial_aggregates(spark):
    df = repetition_stats(_docs(spark, [(1, "a b c")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan  # map-side combine on both signal aggs
    assert "FlatMapGroupsInPandas" not in plan  # pure JVM path
