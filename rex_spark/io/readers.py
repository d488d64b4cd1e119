"""Sources (S1-S9): schema-declared readers for the formats REx consumes.

Re-expressions, not ports: each reader returns a DataFrame and pushes
schema/pruning to the scan instead of materializing python dict lists
(rex/utils/io.py:70-135 loads whole files into memory on one machine).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonlines(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S1 (rex/utils/io.py:70-76): one record per line.  An explicit
    schema skips Spark's inference pass (one full read saved)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonlines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2 (rex/utils/io.py:56-62)."""
    df.write.mode(mode).json(path)


def read_delimited(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    header: bool = False,
    schema: StructType | None = None,
) -> DataFrame:
    """S4 (rex/utils/io.py:98-135): csv/tsv with optional header."""
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """S7 (rex/utils/io.py:172-175): lazy line reader -> one 'value' column."""
    return spark.read.text(path)


def load_side_input(spark: SparkSession, path: str) -> Any:
    """S3 (rex/utils/io.py:33-48): whole-file JSON side inputs (rel2id,
    type2query) -> broadcast variable, never a shuffled table."""
    with open(path, encoding="utf-8") as fh:
        return spark.sparkContext.broadcast(json.load(fh))


def read_embedding_text(spark: SparkSession, path: str) -> DataFrame:
    """S6 (rex/utils/io.py:138-169): word2vec text format.  First line
    may be an ``N dim`` header; rows whose vector length mismatches the
    modal dimension are skipped (reference semantics).  Returns
    (token STRING, vec ARRAY<DOUBLE>)."""
    lines = spark.read.text(path)
    parts = lines.select(F.split(F.col("value"), r"\s+").alias("p"))
    parsed = parts.select(
        F.col("p")[0].alias("token"),
        F.slice(F.col("p"), 2, 1_000_000).alias("rest"),
    ).where(F.size("rest") > 0)
    parsed = parsed.select(
        "token",
        F.transform("rest", lambda x: x.cast("double")).alias("vec"),
    ).where(~F.exists("vec", lambda v: v.isNull()))
    # drop dim-mismatch rows (incl. a possible "N dim" header line)
    dims = parsed.groupBy(F.size("vec").alias("dim")).count()
    modal = dims.orderBy(F.desc("count"), F.asc("dim")).limit(1)
    return parsed.join(
        F.broadcast(modal.select("dim")), F.size("vec") == F.col("dim")
    ).select("token", "vec")


def filtered_fanout_sink(
    df: DataFrame,
    prob_col: str,
    thresholds: list[float],
    base_path: str,
) -> dict[float, int]:
    """S9 (data/EncyclopediaDS/convert.py:14-53): one scan, N threshold-
    filtered jsonl sinks; returns per-threshold row counts.  The input
    is cached once so the scan isn't repeated per threshold, and each
    count rides the WRITE job via observe() — one action per threshold,
    not a write + a separate count over the cache."""
    from pyspark.sql import Observation

    df = df.cache()
    counts: dict[float, int] = {}
    try:
        for t in thresholds:
            obs = Observation(f"fanout_gt{t}")
            out = df.where(F.col(prob_col) > t).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            out.write.mode("overwrite").json(f"{base_path}/gt{t}")
            counts[t] = obs.get["n"]
    finally:
        df.unpersist()
    return counts
