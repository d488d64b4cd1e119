"""Bag-level (distant supervision) aggregation: A6 / J3.

Re-expresses REx's bag semantics (rex/data/transforms/bag_re.py:39-83:
bag = all sentences sharing an entity pair; rex/models/bag_pcnn.py:
PCNN-ONE picks the max-scoring member, PCNN-Att softmax-weights
members) as pure groupBy aggregations — ``bag_scope`` bookkeeping
disappears into the shuffle.

Input: long-format scored rows (one per bag member).  No collect_list
of whole bags: ONE is max_by, ATT is a ratio of two sums — both
map-side partial, hub-pair (Zipfian) safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bag_one(
    scored: DataFrame,
    bag_keys: list[str],
    score_col: str = "score",
) -> DataFrame:
    """PCNN-ONE: the max-scoring member represents the bag."""
    others = [c for c in scored.columns if c not in bag_keys]
    agg = scored.groupBy(*bag_keys).agg(
        F.max_by(F.struct(*others), F.col(score_col)).alias("_best"),
        F.count(F.lit(1)).alias("bag_size"),
    )
    return agg.select(
        *bag_keys, *[F.col(f"_best.{c}").alias(c) for c in others], "bag_size"
    )


def bag_attention(
    scored: DataFrame,
    bag_keys: list[str],
    score_col: str = "score",
) -> DataFrame:
    """PCNN-Att: softmax(score)-weighted mean score per bag.

    att = sum(exp(s)*s)/sum(exp(s)) — two partial-aggregable sums, no
    per-bag array materialization.  exp is stabilized by subtracting
    the bag max (a window over the same key: the groupBy reuses the
    window's hash partitioning, so it is still one shuffle).
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    mx = F.max(s).over(Window.partitionBy(*bag_keys))
    e = F.exp(s - mx)
    weighted = scored.select(*bag_keys, e.alias("_e"), (e * s).alias("_es"))
    agg = weighted.groupBy(*bag_keys).agg(
        (F.sum("_es") / F.sum("_e")).alias("_att"),
        F.count(F.lit(1)).alias("bag_size"),
    )
    return agg.select(
        *bag_keys,
        F.round(F.col("_att"), 6).alias("att_score"),
        "bag_size",
    )
