"""Skew-defusing aggregation patterns (SURVEY §2.3 J7).

Plain counts survive hub keys because Spark partially aggregates
map-side; the aggregations that genuinely melt a reducer at web scale
are the ones with NON-partial state — collecting distinct provenance
items (urls, doc ids) per hot edge.  ``salted_collect_slice`` is the
two-phase shape for those: phase 1 spreads each hot key's raw rows
over ``salt_partitions`` deterministic salt buckets and collects
per-bucket distinct sets (bounded fan-in per reducer); phase 2 merges
the at-most-``salt_partitions`` partial sets per key and truncates to
the top-k AFTER the merge, so the result is identical to the unsalted
aggregation (pinned by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_slice(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int,
    salt_partitions: int = 0,
) -> DataFrame:
    """Per key: sorted first-k distinct items + total row count.

    ``salt_partitions`` <= 1 runs the direct single-phase aggregation;
    > 1 runs the skew-proof two-phase version with identical output.
    """
    if salt_partitions <= 1:
        return df.groupBy(*keys).agg(
            F.slice(F.sort_array(F.collect_set(item_col)), 1, k).alias("items"),
            F.count(F.lit(1)).alias("support"),
        )
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*keys, item_col), F.lit(salt_partitions)),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.collect_set(item_col).alias("_items"),
        F.count(F.lit(1)).alias("_c"),
    )
    return partial.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_items")))),
            1,
            k,
        ).alias("items"),
        F.sum("_c").alias("support"),
    )
