"""End-to-end KG construction pipeline (the north-star DAG).

pages (Iceberg-shaped input table) -> docs -> sentences -> triples
-> mentions -> canonical entities/edges, with optional StageStore
checkpointing so a killed job resumes from the last committed stage.

Stage graph (shuffle boundaries marked *):

    pages --strip--> docs --segment--> sentences --fused extract--> triples
                                           |                            |
                                           +--mentions--> *surfaces     |
                                                     *similarity edges  |
                                                     *components        |
                                                          +--> entities |
                                                          +--> edges <--+

The text plane is entirely narrow (zero shuffles from scan to triple
emission); the graph plane owns the shuffles and is where skew handling
(AQE skew join, salted support aggregation) lives.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession

from .io.stages import StageStore
from .kernels.synth import make_pages
from .operators.canonical import (
    canonicalize_surfaces,
    edges_from_labeled,
    entities_from_labeled,
)
from .operators.extraction import (
    detect_mentions,
    document_triple_set,
    extract_triples_fused,
)
from .operators.textplane import PAGES_SCHEMA, clean_pages, segment_sentences


def build_pages_df(spark: SparkSession, n_pages: int, seed: int = 42) -> DataFrame:
    """Synthesize the input table (BASELINE.json input_hint shape).

    Deterministic stand-in for the Common-Crawl Iceberg table; at
    deployment this is ``spark.read.table("pages")`` and everything
    downstream is unchanged.
    """
    pages, _planted = make_pages(n_pages, seed=seed)
    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in pages
    ]
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store: StageStore | None = None,
    salt_partitions: int = 8,
) -> Dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns all stage DataFrames.

    With a StageStore, every stage is compute-or-load and appends
    per-partition lineage rows.  Without one, stages that fan out to
    multiple consumers (sentences -> triples+mentions; triples ->
    edges+triple_set) are persisted MEMORY_AND_DISK so forcing the
    pipeline's several outputs does not recompute the text plane once
    per output — the in-memory analog of the stage checkpoints.
    """
    from pyspark import StorageLevel

    def stage(name: str, fn, partition_by=None, persist: bool = False) -> DataFrame:
        if store is None:
            df = fn()
            if persist:
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
            return df
        return store.run(name, fn, partition_by=partition_by)

    docs = stage("docs", lambda: clean_pages(pages))
    sentences = stage("sentences", lambda: segment_sentences(docs), persist=True)
    triples = stage("triples", lambda: extract_triples_fused(sentences), persist=True)
    mentions = stage("mentions", lambda: detect_mentions(sentences))

    labeled = stage(
        "surfaces", lambda: canonicalize_surfaces(spark, mentions), persist=True
    )
    entities = stage("entities", lambda: entities_from_labeled(labeled))
    edges = stage(
        "edges",
        lambda: edges_from_labeled(labeled, triples, salt_partitions=salt_partitions),
    )

    return {
        "docs": docs,
        "sentences": sentences,
        "triples": triples,
        "mentions": mentions,
        "surfaces": labeled,
        "entities": entities,
        "edges": edges,
        "triple_set": document_triple_set(triples),
    }
