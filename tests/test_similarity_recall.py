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


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF's regime is CLUSTERED data (real embeddings): when true
    neighbors share a centroid, probe-4-of-16 recovers the exact
    top-k near-perfectly.  Planted clusters pin that from below."""
    import numpy as np

    from rex_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(11)
    rows, vid = [], 0
    for _c in range(8):
        center = rng.randn(64) * 3
        for _ in range(20):
            v = center + rng.randn(64) * 0.3
            rows.append((vid, [float(np.float32(x)) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = list(range(10))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_ids=qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, query_ids=qids, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@5 = {recall:.3f}"


def _clustered_embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows, vid = [], 0
    for _c in range(8):
        center = rng.randn(64) * 3
        for _ in range(20):
            v = center + rng.randn(64) * 0.3
            rows.append((vid, [float(np.float32(x)) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ann_auto_select_family_per_regime(spark, embeddings):
    """The clusterability probe routes each regime to its measured-best
    family: weakly-correlated corpus embeddings -> LSH (IVF recall
    collapses there, BASELINE.md IVF grid), planted clusters -> IVF."""
    from rex_spark.operators.similarity import select_ann

    d_flat = select_ann(embeddings, target_recall=0.9)
    assert d_flat["family"] == "lsh"
    assert not d_flat["probe"]["clustered"]
    # the pick is the cheapest measured grid point clearing 0.9
    assert d_flat["params"] == {"n_planes": 4, "n_tables": 16}

    d_clus = select_ann(_clustered_embeddings(spark), target_recall=0.9)
    assert d_clus["family"] == "ivf"
    assert d_clus["probe"]["clustered"]

    # an unreachable target degrades honestly to brute force
    assert select_ann(embeddings, target_recall=1.01)["family"] == "brute"


@pytest.mark.parametrize("regime", ["flat", "clustered"])
def test_ann_topk_auto_hits_target_recall(spark, embeddings, regime):
    """ann_topk(auto=True) reaches >= 0.9 recall@5 on BOTH embedding
    regimes — the whole point of shipping two families + a selector."""
    from rex_spark.operators.similarity import ann_topk

    emb = embeddings if regime == "flat" else _clustered_embeddings(spark)
    qids = list(range(20)) if regime == "flat" else list(range(10))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_ids=qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk(emb, query_ids=qids, k=5, auto=True,
                          target_recall=0.9).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"{regime}: recall@5 = {recall:.3f}"


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
