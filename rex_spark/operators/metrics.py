"""Distributed metrics: faceted triple P/R/F1 and tagging metrics.

Re-expresses rex/metrics/triple.py:6-43 (A1/A2, set semantics per
instance, four facets) and rex/metrics/tagging.py (A3 per-type + macro)
as DataFrame aggregations: the set ops become distinct projections +
inner/anti joins (J4/U1), the tp/fp/fn accumulation becomes one global
aggregate, and P/R/F1 is plain column arithmetic with safe division.

Must agree exactly with the in-process kernels.metrics.measure_triple
(asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _facet_projection(df: DataFrame, facet: str, instance_col: str) -> DataFrame:
    cols = {
        "triple": ["subj", "pred", "obj"],
        "subject": ["subj"],
        "relation": ["pred"],
        "object": ["obj"],
    }[facet]
    return df.select(instance_col, *cols).distinct()


def _safe_div(num, den):
    return F.when(den == 0, F.lit(0.0)).otherwise(num / den)


def _overlap_counts(p: DataFrame, g: DataFrame, on: list, label) -> DataFrame:
    """One-row (facet/label, tp, fp, fn) via a single full-outer join —
    no driver-side .count() jobs; unioned facet aggregates compute in
    one Spark job when the result is forced."""
    j = p.withColumn("_p", F.lit(1)).join(
        g.withColumn("_g", F.lit(1)), on, "full_outer"
    )
    both = (F.col("_p").isNotNull() & F.col("_g").isNotNull()).cast("long")
    only_p = (F.col("_p").isNotNull() & F.col("_g").isNull()).cast("long")
    only_g = (F.col("_p").isNull() & F.col("_g").isNotNull()).cast("long")
    return j.agg(
        label.alias("facet"),
        F.coalesce(F.sum(both), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(only_p), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(only_g), F.lit(0)).alias("fn"),
    )


def triple_prf1(
    pred: DataFrame, gold: DataFrame, instance_col: str = "url"
) -> DataFrame:
    """Faceted P/R/F1 DataFrame: one row per facet.

    pred/gold: (instance_col, subj, pred, obj).  Each facet's tp/fp/fn
    comes from ONE full-outer join aggregate; the four facets union
    lazily, so forcing the result is a single multi-join job instead of
    the 12 count jobs a per-metric loop would launch.
    """
    parts = []
    for facet in ("triple", "subject", "object", "relation"):
        p = _facet_projection(pred, facet, instance_col)
        g = _facet_projection(gold, facet, instance_col)
        parts.append(_overlap_counts(p, g, list(p.columns), F.lit(facet)))
    counts = parts[0]
    for part in parts[1:]:
        counts = counts.unionByName(part)
    p_col = _safe_div(F.col("tp"), F.col("tp") + F.col("fp"))
    r_col = _safe_div(F.col("tp"), F.col("tp") + F.col("fn"))
    counts = counts.withColumn("p", p_col).withColumn("r", r_col)
    f1 = _safe_div(2 * F.col("p") * F.col("r"), F.col("p") + F.col("r"))
    return counts.withColumn("f1", f1).select(
        "facet", "p", "r", "f1", "tp", "fp", "fn"
    )


def triple_prf1_dict(pred: DataFrame, gold: DataFrame, instance_col: str = "url"):
    """Driver-side dict mirroring kernels.metrics.measure_triple output."""
    rows = triple_prf1(pred, gold, instance_col).collect()
    return {
        r["facet"]: {
            "p": r["p"], "r": r["r"], "f1": r["f1"],
            "tp": r["tp"], "fp": r["fp"], "fn": r["fn"],
        }
        for r in rows
    }


def tagging_prf1(
    pred_ents: DataFrame, gold_ents: DataFrame, instance_col: str = "url"
) -> DataFrame:
    """A3: per-entity-type P/R/F1 + macro row.

    pred/gold: (instance_col, ent_type, start, end).  Per-type counts
    via one inner + two anti joins grouped by type; macro = avg of
    per-type metrics (rex/metrics/tagging.py:18-95).
    """
    key = [instance_col, "ent_type", "start", "end"]
    p = pred_ents.select(*key).distinct()
    g = gold_ents.select(*key).distinct()
    tp = p.join(g, key, "inner").groupBy("ent_type").agg(F.count("*").alias("tp"))
    fp = p.join(g, key, "left_anti").groupBy("ent_type").agg(
        F.count("*").alias("fp")
    )
    fn = g.join(p, key, "left_anti").groupBy("ent_type").agg(
        F.count("*").alias("fn")
    )
    counts = (
        tp.join(fp, "ent_type", "full")
        .join(fn, "ent_type", "full")
        .fillna(0, ["tp", "fp", "fn"])
    )
    p_col = _safe_div(F.col("tp"), F.col("tp") + F.col("fp"))
    r_col = _safe_div(F.col("tp"), F.col("tp") + F.col("fn"))
    counts = counts.withColumn("p", p_col).withColumn("r", r_col)
    counts = counts.withColumn(
        "f1", _safe_div(2 * F.col("p") * F.col("r"), F.col("p") + F.col("r"))
    )
    macro = counts.select(
        F.lit("macro").alias("ent_type"),
        F.avg("p").alias("p"),
        F.avg("r").alias("r"),
        F.avg("f1").alias("f1"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    )
    return counts.select("ent_type", "p", "r", "f1", "tp", "fp", "fn").unionByName(
        macro
    )


def mrc_overlap_prf1(pred_spans: DataFrame, gold_spans: DataFrame) -> DataFrame:
    """A10 overlap metric (rex/metrics/mrc_ner.py:24-43): per-doc
    entity sets (already unioned across type queries, the
    mrc_fanout_union output shape ``doc_id, ent_type, start_pos,
    end_pos``) scored at position level with tagging_prf1's
    micro-per-type + macro semantics."""
    key = ["doc_id", "ent_type", "start_pos", "end_pos"]
    j = pred_spans.select(*key).withColumn("_p", F.lit(1)).join(
        gold_spans.select(*key).withColumn("_g", F.lit(1)), key, "full_outer"
    )
    both = (F.col("_p").isNotNull() & F.col("_g").isNotNull()).cast("long")
    only_p = (F.col("_p").isNotNull() & F.col("_g").isNull()).cast("long")
    only_g = (F.col("_p").isNull() & F.col("_g").isNotNull()).cast("long")
    counts = j.groupBy("ent_type").agg(
        F.coalesce(F.sum(both), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(only_p), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(only_g), F.lit(0)).alias("fn"),
    )
    # counts is one tiny row per type, but its lineage is the two heavy
    # fan-out trees; the per-type/macro/micro branches below reference
    # it three times, so checkpoint it once instead of carrying the
    # whole tree per branch (the pre-checkpoint plan was ~1200 lines).
    # eager=False: nothing runs at plan-construction time — the
    # checkpoint materializes on the caller's first action.  Cluster
    # caveat: localCheckpoint blocks are not recoverable after executor
    # loss; a real deployment sets a checkpoint dir and uses
    # .checkpoint() here (same shape, reliable storage).
    counts = counts.localCheckpoint(eager=False)

    def prf(df):
        df = df.withColumn(
            "p", _safe_div(F.col("tp"), F.col("tp") + F.col("fp"))
        ).withColumn("r", _safe_div(F.col("tp"), F.col("tp") + F.col("fn")))
        return df.withColumn(
            "f1", _safe_div(2 * F.col("p") * F.col("r"), F.col("p") + F.col("r"))
        ).select("ent_type", "p", "r", "f1", "tp", "fp", "fn")

    per_type = prf(counts)
    macro = per_type.agg(
        F.lit("macro").alias("ent_type"),
        F.avg("p").alias("p"),
        F.avg("r").alias("r"),
        F.avg("f1").alias("f1"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    ).select("ent_type", "p", "r", "f1", "tp", "fp", "fn")
    micro = prf(
        counts.agg(
            F.lit("micro").alias("ent_type"),
            F.sum("tp").alias("tp"),
            F.sum("fp").alias("fp"),
            F.sum("fn").alias("fn"),
        )
    )
    return per_type.unionByName(macro).unionByName(micro)
