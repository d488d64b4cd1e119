#!/usr/bin/env python
"""Measure where the J7 salt is load-bearing and record it in BASELINE.md.

Workload: N rows where one hot key holds the stated fraction of ALL
rows (the head-entity shape), aggregated to the sorted first-k distinct
items + count per key, three ways:

- jvm direct: ``salted_collect_slice(salt=0)`` — Spark's own
  ObjectHashAggregate with partial_collect_set.  The hypothesis this
  bench TESTS (and confirms) is that JVM partial aggregation already
  absorbs row-skew: each map task pre-dedups, reducers see bounded
  partial states, salting would only add a shuffle.
- udf direct: ``salted_udf_collect_slice(salt=0)`` — the same logic as
  a pandas GROUPED_MAP, the shape of every model-scoring / bag-reducer
  UDAF.  NO partial step exists: all raw rows of the hot key ship to
  one Python worker.  This is the genuine straggler.
- udf salted16: phase 1 on (key, salt) buckets, phase 2 JVM merge —
  identical output, worst task bounded by the salt width.

Results are asserted identical across all three before timing.

Usage: PYTHONPATH=. python tools/skew_bench.py [--update-baseline]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

N_ROWS = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "40000000"))
N_ITEMS = 200_000
K = 5
RUNS = 3

# (label, hot-key row fraction in tenths)
WORKLOADS = (("mild (40% hot)", 4), ("extreme (90% hot)", 9))


def build(spark, hot_tenths: int):
    from pyspark.sql import functions as F

    base = spark.range(N_ROWS)
    h = F.xxhash64("id")
    key = F.when(F.pmod(h, F.lit(10)) < hot_tenths, F.lit(0)).otherwise(
        F.pmod(h, F.lit(997)) + 1
    )
    item = F.concat(
        F.lit("user-padding-"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_ITEMS))
    )
    return base.select(key.alias("k"), item.alias("item"))


def measure(spark):
    from rex_spark.operators.skew import (
        salted_collect_slice,
        salted_udf_collect_slice,
    )

    variants = (
        ("jvm direct", lambda df: salted_collect_slice(df, ["k"], "item", k=K, salt_partitions=0)),
        ("udf direct", lambda df: salted_udf_collect_slice(df, ["k"], "item", k=K, salt_partitions=0)),
        ("udf salted16", lambda df: salted_udf_collect_slice(df, ["k"], "item", k=K, salt_partitions=16)),
    )

    def force(out):
        out.write.format("noop").mode("overwrite").save()

    canon = lambda d: sorted(  # noqa: E731
        (r["k"], ",".join(r["items"]), r["support"]) for r in d.collect()
    )
    results = {}
    for label, tenths in WORKLOADS:
        df = build(spark, tenths)
        expected = canon(variants[0][1](df))
        for name, fn in variants[1:]:
            assert canon(fn(df)) == expected, f"{name} diverged"
        out = {}
        for name, fn in variants:
            times = []
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                force(fn(df))
                times.append(time.perf_counter() - t0)
            out[name] = {
                "median_sec": round(statistics.median(times), 2),
                "all": [round(t, 2) for t in times],
            }
        results[label] = out
    return results


def render(results) -> str:
    lines = [
        "## Skew defusal (J7, tools/skew_bench.py)",
        "",
        f"{N_ROWS:,} rows, sorted first-{K} distinct items + count per key",
        f"({N_ITEMS:,} distinct items); one key holds the stated fraction of",
        "ALL rows.  Outputs verified identical across variants before timing",
        f"(median of {RUNS} runs, local[32]):",
        "",
        "| workload | jvm direct (s) | udf direct (s) | udf salted16 (s) | salt speedup (udf) |",
        "|---|---|---|---|---|",
    ]
    for label, out in results.items():
        j = out["jvm direct"]["median_sec"]
        d = out["udf direct"]["median_sec"]
        s = out["udf salted16"]["median_sec"]
        lines.append(f"| {label} | {j} | {d} | {s} | {round(d / s, 2)}x |")
    lines += [
        "",
        "What this shows (and the design rule the pipeline follows):",
        "Spark's JVM aggregates (incl. collect_set) carry PARTIAL",
        "implementations, so map-side pre-merge already absorbs row skew —",
        "salting those only adds a shuffle.  The Python GROUPED_MAP slot",
        "(model scoring, bag reducers) has no partial step: all raw rows of",
        "the hot key ship to ONE worker, and the straggler grows linearly",
        "with the head key however large the cluster — there the 16-way salt",
        "bounds the worst task and wins by the measured factor (growing with",
        "skew).  Rule: prefer JVM partial-aggregating expressions; when the",
        "logic must live in a pandas UDAF and is merge-decomposable, use the",
        "salted two-phase form (salted_udf_collect_slice is the template).",
        "",
    ]
    return "\n".join(lines)


def update_baseline(section: str) -> None:
    from tools.section_util import replace_section

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md"
    )
    replace_section(path, "## Skew defusal (J7, tools/skew_bench.py)", section)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rex_spark.session import get_session

    spark = get_session(app_name="skew_bench")
    out = measure(spark)
    section = render(out)
    if "--update-baseline" in sys.argv:
        update_baseline(section)
        print("BASELINE.md updated")
    print(section)


if __name__ == "__main__":
    main()
