"""Incremental ingest via Structured Streaming (SURVEY §2.9).

The reference has no event-time streaming (its StreamReadDataset,
rex/data/dataset.py:59-93, is a lazy iterator = mapPartitions
semantics); the batch pipeline is primary.  This module is the
optional incremental path: new page files landing in a directory are
picked up by ``readStream``, run through the SAME batch stage
functions inside ``foreachBatch``, and appended to the same output
tables — one code path for the transforms, two drivers (batch rerun vs
micro-batch).

Scale notes: ``maxFilesPerTrigger`` bounds micro-batch size; the
``warc_ts`` watermark bounds state for the windowed aggregation; all
heavy lifting stays in the batch operators, so everything said about
their partitioning/skew behavior applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import document_triple_set, extract_triples_fused
from ..operators.textplane import PAGES_SCHEMA, clean_pages, segment_sentences


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming source over a directory of pages parquet files
    (the sandbox stand-in for an Iceberg incremental-read stream)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def incremental_triples(
    pages_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """pages stream -> triples appended to ``output_dir`` (parquet).

    foreachBatch reuses the batch operators verbatim; the streaming
    checkpoint gives exactly-once per micro-batch, which together with
    the deterministic transforms makes the output restart-idempotent —
    the streaming analog of the StageStore resume contract.

    Returns the StreamingQuery; with ``available_now`` the query drains
    everything currently in the directory and stops (use
    ``query.awaitTermination()``).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        triples = document_triple_set(
            extract_triples_fused(segment_sentences(clean_pages(batch_df)))
        )
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def triple_counts_by_window(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed page/lang counts with late-data handling.

    ``warc_ts`` is the event time (SURVEY §1.3); the watermark bounds
    aggregation state — pages later than ``watermark`` behind the max
    observed warc_ts are dropped, everything else updates its window.
    """
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
