#!/usr/bin/env python
"""Measure the LSH-ANN recall/cost trade (n_planes x n_tables) and
record it in BASELINE.md.

For each grid point: recall@5 of lsh_ann_topk vs the exact brute-force
cosine_topk over the sf0.01 embeddings (500 x 64-dim, weakly correlated
— the hardest recall regime), the candidate count per query (the real
cost driver at scale: candidates ~ n_tables x bucket occupancy), and
wall time of the end-to-end approximate query on this machine.

Usage: PYTHONPATH=. python tools/ann_tradeoff.py [--update-baseline]
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
K = 5
N_QUERIES = 20
PLANES = (2, 4, 6, 8)
TABLES = (4, 8, 16, 32)


def measure(spark):
    from pyspark.sql import functions as F

    from rex_spark.operators.similarity import (
        _normed,
        bucketed,
        cosine_topk,
        lsh_ann_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_vecs = emb.count()
    qids = list(range(N_QUERIES))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_ids=qids, k=K).collect()
    }
    import statistics

    rows = []
    for planes in PLANES:
        for tables in TABLES:
            # median of 3 per CLAUDE.md methodology (the VM throws
            # multi-x outliers; a single sample into BASELINE.md lies)
            walls, ap = [], set()
            for _ in range(3):
                t0 = time.perf_counter()
                ap = {
                    (r["query_id"], r["neighbor_id"])
                    for r in lsh_ann_topk(
                        emb, query_ids=qids, k=K, n_planes=planes, n_tables=tables
                    ).collect()
                }
                walls.append(time.perf_counter() - t0)
            wall = statistics.median(walls)
            recall = len(exact & ap) / len(exact)
            # candidate pairs actually scored (the scale cost)
            b = bucketed(_normed(emb), planes, tables).select(
                "vec_id", "table_id", "bucket"
            )
            q = b.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "table_id", "bucket"
            )
            n_cand = (
                b.join(q, ["table_id", "bucket"])
                .where(F.col("vec_id") != F.col("query_id"))
                .select("query_id", "vec_id")
                .distinct()
                .count()
            )
            rows.append(
                {
                    "planes": planes,
                    "tables": tables,
                    "recall": round(recall, 3),
                    "cand_per_query": round(n_cand / len(qids), 1),
                    "scan_frac": round(n_cand / (len(qids) * (n_vecs - 1)), 3),
                    "sec": round(wall, 2),
                }
            )
            print(rows[-1], flush=True)
    return rows, n_vecs


def render(rows, n_vecs) -> str:
    lines = [
        "## ANN recall/cost trade (tools/ann_tradeoff.py)",
        "",
        f"lsh_ann_topk vs exact cosine_topk, recall@{K} over {N_QUERIES} queries on",
        f"the sf0.01 embeddings ({n_vecs} x 64-dim, weakly correlated — top cosine",
        "~0.4, the hardest recall regime; clustered real embeddings bucket far",
        "better).  `cand/query` is the average number of candidates scored per",
        "query — the quantity that replaces the full n-vector scan at 100 TB;",
        "`scan frac` is that as a fraction of brute force.  Recall rises with",
        "tables (union of probes) and falls with planes (smaller buckets);",
        "cost does the opposite — pick the cheapest point at the target recall.",
        "",
        "| planes | tables | recall@5 | cand/query | scan frac | wall (s, median of 3) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['planes']} | {r['tables']} | {r['recall']} "
            f"| {r['cand_per_query']} | {r['scan_frac']} | {r['sec']} |"
        )
    lines += [
        "",
        "The shipped default (4 planes x 16 tables) clears the 0.7 recall "
        "gate with margin (0.9) at ~0.64 of the brute-force scan ON THIS "
        "500-VECTOR WORST CASE — with n this small, 16 probed buckets of "
        "~n/16 each nearly cover the set.  The scan fraction shrinks as n "
        "grows (per-query cost stays O(tables x bucket occupancy) with "
        "occupancy ~n/2^planes per table, so raise planes with log2(n) to "
        "hold bucket size constant while brute force grows O(n)).",
        "",
    ]
    return "\n".join(lines)


def update_baseline(section: str) -> None:
    from tools.section_util import replace_section

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md"
    )
    replace_section(path, "## ANN recall/cost trade (tools/ann_tradeoff.py)", section)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rex_spark.session import get_session

    spark = get_session(app_name="ann_tradeoff")
    rows, n_vecs = measure(spark)
    section = render(rows, n_vecs)
    if "--update-baseline" in sys.argv:
        update_baseline(section)
        print("BASELINE.md updated")
    else:
        print(section)


if __name__ == "__main__":
    main()
