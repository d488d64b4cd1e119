#!/usr/bin/env python
"""Measure the literal-weight vs Arrow bucketing crossover (VERDICT r3
watch item: `similarity.bucketed` inlines tables x planes x dim literal
weights into the plan — fine at the 4x16x64 default, suspected codegen
bloat at larger settings).

Two sweeps, medians of N_RUNS with spark.catalog.clearCache() between
runs (repo bench convention), timings INCLUDE plan build:

1. weight sweep at small n (2,000 rows): exposes the literal plan's
   FIXED build cost (~1 ms per inlined weight — py4j literal
   construction + codegen), which the Arrow path doesn't pay;
2. row sweep at fixed weights: exposes the per-row costs — literal's
   executor throughput wins 20-100x once the build cost is amortized
   (the Arrow fan-out ships each vector n_tables times through
   Arrow), putting the auto crossover at ~100k ROWS, roughly
   independent of the weight count (both sides scale with it).

Run:  PYTHONPATH=. python tools/bucketed_bench.py
"""

from __future__ import annotations

import json
import statistics
import time

N_VECTORS = 2000
N_PLANES = 4
N_RUNS = 3


def synth_embeddings(spark, n, dim, seed=7):
    from pyspark.sql import functions as F

    # deterministic per (id, dim) — same splitmix64 family as the engine
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), i -> "
            f"cast(xxhash64(id * {dim} + i, {seed}) as double) / 9.3e18)"
        ).cast("array<double>").alias("embedding"),
    )


def _timed_cell(spark, emb, n_expected, n_tables, dim):
    from rex_spark.operators.similarity import _normed, bucketed

    row = {}
    for impl in ("literal", "arrow"):
        walls = []
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = bucketed(
                _normed(emb), N_PLANES, n_tables, dim, impl=impl
            ).count()
            walls.append(time.perf_counter() - t0)
            if walls[0] > 30:
                # plan-build dominated and deterministic (the VM's 2x
                # outliers hit short runs); one run suffices, keeps the
                # 262k-weight cell (~4 min/run) affordable
                break
        assert n == n_expected * n_tables
        row[impl] = round(statistics.median(walls), 2)
    row["ratio_lit_over_arrow"] = round(row["literal"] / row["arrow"], 2)
    return row


def main():
    from rex_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8,
                        app_name="bucketed_bench")

    print("# weight sweep (n=2,000 rows: literal pays plan build)", flush=True)
    for dim in (64, 256, 1024):
        emb = synth_embeddings(spark, N_VECTORS, dim)
        emb.write.mode("overwrite").parquet(f"/tmp/bucketed_bench_{dim}")
        emb = spark.read.parquet(f"/tmp/bucketed_bench_{dim}")
        for n_tables in (16, 64):
            row = {"dim": dim, "tables": n_tables,
                   "weights": N_PLANES * n_tables * dim}
            row.update(_timed_cell(spark, emb, N_VECTORS, n_tables, dim))
            print(json.dumps(row), flush=True)

    print("# row sweep (fixed weights: literal amortizes, arrow pays "
          "tables x Arrow fan-out per row)", flush=True)
    for dim, n_tables in ((64, 16), (256, 64)):
        for n in (2_000, 20_000, 200_000, 1_000_000):
            if n * dim > 200_000_000:  # keep the synth parquet bounded
                continue
            path = f"/tmp/bucketed_bench_rows_{dim}_{n}"
            synth_embeddings(spark, n, dim).write.mode("overwrite").parquet(path)
            emb = spark.read.parquet(path)
            row = {"dim": dim, "tables": n_tables, "rows": n,
                   "weights": N_PLANES * n_tables * dim}
            row.update(_timed_cell(spark, emb, n, n_tables, dim))
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
