"""The literal-weight and Arrow bucketing implementations are
interchangeable: identical (vec_id, table_id, bucket) assignments,
identical downstream ANN results, and the auto guard picks the
measured-cheaper implementation by input row count."""

import os

import pytest
from pyspark.sql import functions as F

from rex_spark.operators.similarity import (
    _arrow_max_rows,
    _normed,
    bucketed,
    lsh_ann_topk,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _assignments(df):
    return {
        (r["vec_id"], r["table_id"], r["bucket"])
        for r in df.select("vec_id", "table_id", "bucket").collect()
    }


def test_arrow_buckets_equal_literal_buckets(spark, embeddings):
    e = _normed(embeddings)
    lit = _assignments(bucketed(e, 4, 16, 64, impl="literal"))
    arr = _assignments(bucketed(e, 4, 16, 64, impl="arrow"))
    assert lit == arr and len(lit) == embeddings.count() * 16


def test_auto_guard_picks_by_row_count(spark, embeddings):
    def is_arrow(df):
        return "MapInPandas" in df._jdf.queryExecution().analyzed().toString()

    e = _normed(embeddings)
    # no hint -> literal (the scale default: measured 20-100x faster
    # executor throughput once the plan-build cost is amortized)
    assert not is_arrow(bucketed(e, 4, 16, 64, impl="auto"))
    # known-small input -> arrow (literal's fixed plan cost dominates)
    small = bucketed(e, 4, 16, 64, impl="auto", n_rows_hint=500)
    assert 500 < _arrow_max_rows(4, 16, 64) and is_arrow(small)
    # known-large input -> literal even at a big weight count
    big = bucketed(e, 4, 64, 1024, impl="auto", n_rows_hint=2_000_000)
    assert not is_arrow(big)
    # the threshold scales INVERSELY with the weight count (Arrow's
    # per-row cost grows with tables x dim): 50k rows is arrow
    # territory at the default cell but literal at a 16x bigger one
    assert is_arrow(bucketed(e, 4, 16, 64, impl="auto", n_rows_hint=50_000))
    assert not is_arrow(
        bucketed(e, 4, 64, 256, impl="auto", n_rows_hint=50_000)
    )


def test_lsh_ann_topk_identical_through_either_impl(spark, embeddings):
    """End-to-end: forcing the Arrow bucketing under lsh_ann_topk
    changes nothing in the ANN result (same candidates, same ranks)."""
    import rex_spark.operators.similarity as S

    qids = list(range(10))
    base = {
        tuple(r)
        for r in lsh_ann_topk(embeddings, query_ids=qids, k=5).collect()
    }
    orig = S.bucketed
    try:
        S.bucketed = lambda e, p=4, t=16, d=64, impl="auto": orig(
            e, p, t, d, impl="arrow"
        )
        forced = {
            tuple(r)
            for r in lsh_ann_topk(embeddings, query_ids=qids, k=5).collect()
        }
    finally:
        S.bucketed = orig
    assert forced == base
