#!/usr/bin/env python
"""Measure the IVF-ANN recall/cost trade (n_centroids x n_probe) and
record it in BASELINE.md — the second ANN family's analog of
tools/ann_tradeoff.py, so both scale paths carry MEASURED trade-offs
rather than asserted ones.

For each grid point: recall@5 of ivf_topk vs exact cosine_topk over
the sf0.01 embeddings (500 x 64-dim, weakly correlated — the hardest
regime; tests/test_similarity_recall.py separately pins >= 0.9 on
CLUSTERED data, where IVF actually shines), candidates scored per
query (probed inverted-list mass — the real cost at scale), and wall
time (median of 3).

Usage: PYTHONPATH=. python tools/ivf_tradeoff.py [--update-baseline]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
K = 5
N_QUERIES = 20
CENTROIDS = (8, 16, 32)
PROBES = (1, 2, 4, 8)


def measure(spark):
    import hashlib

    import numpy as np

    from rex_spark.operators.similarity import (
        _ivf_rows,
        cosine_topk,
        ivf_fit,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_vecs = emb.count()
    qids = list(range(N_QUERIES))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_ids=qids, k=K).collect()
    }

    # loop-invariant: the full vector pull, the md5 hash-sample order
    # (the same one ivf_topk trains on), and a vec_id -> row position
    # map (NEVER assume vec_id == index — a regenerated table with
    # 1-based or sparse ids would silently shift every probe lookup)
    rows_v = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    vecs = [r["embedding"] for r in rows_v]
    ids = [r["vec_id"] for r in rows_v]
    pos_of = {vid: i for i, vid in enumerate(ids)}
    hash_order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )[:4096]

    rows = []
    for cents in CENTROIDS:
        # fit depends only on cents — once per centroids setting
        centroids = ivf_fit([vecs[i] for i in hash_order], n_centroids=cents)
        for probe in PROBES:
            if probe > cents:
                continue
            walls, ap = [], set()
            for _ in range(3):  # median of 3 (CLAUDE.md methodology)
                t0 = time.perf_counter()
                ap = {
                    (r["query_id"], r["neighbor_id"])
                    for r in ivf_topk(
                        emb,
                        query_ids=qids,
                        k=K,
                        n_centroids=cents,
                        n_probe=probe,
                    ).collect()
                }
                walls.append(time.perf_counter() - t0)
            recall = len(exact & ap) / len(exact)
            # candidate mass = sum over queries of probed-list sizes,
            # from the same deterministic fit the query used
            assign, probes_m = _ivf_rows(vecs, centroids, probe)
            list_sizes = np.bincount(assign, minlength=cents)
            n_cand = sum(
                int(list_sizes[c] - (assign[pos_of[q]] == c))
                for q in qids
                for c in probes_m[pos_of[q]]
            )
            rows.append(
                {
                    "centroids": cents,
                    "probe": probe,
                    "recall": round(recall, 3),
                    "cand_per_query": round(n_cand / len(qids), 1),
                    "scan_frac": round(n_cand / (len(qids) * (n_vecs - 1)), 3),
                    "sec": round(statistics.median(walls), 2),
                }
            )
            print(rows[-1], flush=True)
    return rows, n_vecs


def render(rows, n_vecs) -> str:
    lines = [
        "## IVF recall/cost trade (tools/ivf_tradeoff.py)",
        "",
        f"ivf_topk vs exact cosine_topk, recall@{K} over {N_QUERIES} queries on the",
        f"sf0.01 embeddings ({n_vecs} x 64-dim, weakly correlated — the regime",
        "where coarse quantization helps LEAST; tests/test_similarity_recall.py",
        "pins >= 0.9 on clustered data, IVF's home turf).  `cand/query` is the",
        "probed inverted-list mass per query (what replaces the full scan at",
        "100 TB).  Recall and cost both rise with n_probe; more centroids cut",
        "cost per probe but need more probes for the same recall — classic IVF.",
        "",
        "| centroids | n_probe | recall@5 | cand/query | scan frac | wall (s, median of 3) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['centroids']} | {r['probe']} | {r['recall']} "
            f"| {r['cand_per_query']} | {r['scan_frac']} | {r['sec']} |"
        )
    default = next(
        (r for r in rows if r["centroids"] == 16 and r["probe"] == 4), None
    )
    cited = (
        f"reaches only {default['recall']} recall at {default['scan_frac']} "
        "of the scan"
        if default
        else "was not in this grid"
    )
    lines += [
        "",
        "Measured honestly: on this UNCORRELATED worst case the shipped "
        f"default (16 centroids x 4 probes) {cited} — recall tracks "
        "probed mass almost linearly because without cluster structure "
        "the inverted lists are arbitrary.  That is exactly why the "
        "engine ships TWO ANN families: hyperplane-LSH dominates "
        "unstructured embeddings (0.9 recall at 0.64 scan above), while "
        "IVF wins on clustered ones (recall >= 0.9 pinned by "
        "tests/test_similarity_recall.py at the same 16x4 setting).  At "
        "scale, hold inverted-list length ~constant by growing "
        "n_centroids ~ n/target and keep the fit on the bounded "
        "hash-sample (similarity.py).",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rex_spark.session import get_session

    spark = get_session(app_name="ivf_tradeoff")
    rows, n_vecs = measure(spark)
    section = render(rows, n_vecs)
    if "--update-baseline" in sys.argv:
        from tools.section_util import replace_section

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BASELINE.md",
        )
        replace_section(
            path, "## IVF recall/cost trade (tools/ivf_tradeoff.py)", section
        )
        print("BASELINE.md updated")
    else:
        print(section)


if __name__ == "__main__":
    main()
