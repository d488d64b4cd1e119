"""ANN quality gates: the LSH-bucketed top-k must recover a large
fraction of the exact brute-force top-k (the scale path's correctness
is probabilistic; the gate pins it from below)."""

import os

import pytest

from rex_spark.operators.similarity import cosine_topk, lsh_ann_topk

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_lsh_ann_recall_vs_bruteforce(spark, embeddings):
    qids = list(range(20))
    k = 5
    exact = cosine_topk(embeddings, query_ids=qids, k=k)
    approx = lsh_ann_topk(embeddings, query_ids=qids, k=k)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"recall@{k} = {recall:.3f}"
    # every approx hit must carry the same cosine the exact path computes
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-9


def test_lsh_ann_recall_rises_with_tables(spark, embeddings):
    qids = list(range(10))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embeddings, query_ids=qids, k=5).collect()
    }

    def recall(n_tables):
        ap = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_ann_topk(
                embeddings, query_ids=qids, k=5, n_tables=n_tables
            ).collect()
        }
        return len(exact & ap) / len(exact)

    assert recall(8) >= recall(1)
