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


def bag_score_grouped(
    scored: DataFrame,
    bag_keys: list[str],
    score_col: str = "score",
) -> DataFrame:
    """The M2 applyInPandas surface: one pandas frame per bag.

    Semantics are identical to :func:`bag_attention`; this variant
    exists as the GROUPED_MAP slot where a real bag model (PCNN-Att
    weights over member *representations*, rex/models/bag_pcnn.py:
    142-173) would run — attention over vectors cannot be two sums, it
    genuinely needs the bag materialized in one process.  Keep bags
    Zipfian-safe upstream (cap bag size or pre-aggregate) before this
    operator; Spark cannot split a single group.
    """
    import numpy as np
    import pandas as pd

    keys_schema = ", ".join(
        f"{k} {scored.schema[k].dataType.simpleString()}" for k in bag_keys
    )

    def score_bag(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf[score_col].to_numpy(dtype="float64")
        e = np.exp(s - s.max())
        att = float((e * s).sum() / e.sum())
        out = {k: [pdf[k].iloc[0]] for k in bag_keys}
        out["att_score"] = [round(att, 6)]
        out["bag_size"] = [len(pdf)]
        return pd.DataFrame(out)

    return scored.groupBy(*bag_keys).applyInPandas(
        score_bag, schema=f"{keys_schema}, att_score double, bag_size long"
    )
