"""Skew-defusing aggregation patterns (SURVEY §2.3 J7).

Where row-skew actually hurts in Spark (measured, tools/skew_bench.py):

- JVM aggregates — counts, sums, and even ``collect_set``/
  ``collect_list`` — carry PARTIAL implementations (ObjectHashAggregate
  ``partial_collect_set``), so each map task pre-merges its partition
  and the hot key's reducer receives bounded partial states, not raw
  rows.  Salting these buys little and costs an extra shuffle.
- The Python GROUPED_MAP slot (``applyInPandas`` — model scoring, bag
  reducers, any pandas UDAF) has NO partial step: every raw row of a
  key ships to ONE Python worker.  A head-entity key with 10^8
  provenance rows is a single-task straggler no cluster size fixes.
  This is where the salt is load-bearing.

``salted_collect_slice`` is the two-phase shape: phase 1 spreads each
hot key's raw rows over ``salt_partitions`` deterministic salt buckets
and collects per-bucket distinct sets (bounded fan-in per task);
phase 2 merges the at-most-``salt_partitions`` partial sets per key
and truncates to the top-k AFTER the merge, so the result is identical
to the unsalted aggregation (pinned by tests).
``salted_udf_collect_slice`` is the same contract with phase 1 in a
pandas GROUPED_MAP — the drop-in for UDAFs that cannot be expressed
with JVM partial aggregates.
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


def salted_udf_collect_slice(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int,
    salt_partitions: int = 0,
) -> DataFrame:
    """Same contract as :func:`salted_collect_slice`, phase 1 in a
    pandas GROUPED_MAP — the J7 shape for Python UDAF slots, which have
    no JVM partial aggregation (all raw rows of a key reach one Python
    worker).  ``salt_partitions`` <= 1 is the direct (skew-exposed)
    single-group form; > 1 bounds any task's fan-in to a salt bucket.
    Results are identical either way (pinned by tests)."""
    import pandas as pd

    group_keys = list(keys)
    src = df
    if salt_partitions > 1:
        src = df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*keys, item_col), F.lit(salt_partitions)),
        )
        group_keys = group_keys + ["_salt"]

    item_type = dict(df.dtypes)[item_col]
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in src.select(*keys).dtypes]
        + [f"_items array<{item_type}>", "_c long"]
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        # dropna: the JVM twin's collect_set drops NULL items while
        # still counting the rows — keep the two paths in lockstep
        items = sorted(pdf[item_col].dropna().unique().tolist())
        row = {c: [pdf[c].iloc[0]] for c in keys}
        # direct form can truncate in-group; salted must keep the full
        # bucket-distinct set so the cross-bucket merge stays exact
        row["_items"] = [items[:k] if salt_partitions <= 1 else items]
        row["_c"] = [len(pdf)]
        return pd.DataFrame(row)

    partials = src.groupBy(*group_keys).applyInPandas(partial, schema=out_schema)
    if salt_partitions <= 1:
        return partials.select(
            *keys,
            F.col("_items").alias("items"),
            F.col("_c").alias("support"),
        )
    return partials.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_items")))),
            1,
            k,
        ).alias("items"),
        F.sum("_c").alias("support"),
    )
