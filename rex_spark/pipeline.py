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


def build_pages_df_distributed(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Synthesize the input table ON THE EXECUTORS.

    Page i depends only on (seed, i), so executors generate disjoint id
    ranges independently — byte-identical to :func:`build_pages_df` but
    with no driver materialization, which is the only synthesis path
    that holds at benchmark scale (a driver-side list does not).
    ``start`` offsets the id range (pages start..start+n_pages-1) so
    callers can synthesize disjoint waves of the same corpus.
    """
    import pandas as pd

    from .kernels.synth import make_page

    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [make_page(int(i), seed=seed)[0] for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"] for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )

    return (
        spark.range(start, start + n_pages)
        .repartition(parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store: StageStore | None = None,
    salt_partitions: int = 8,
    include_sentence_text: bool = True,
    score_threshold: float | None = None,
    driver_max_surfaces: int | None = None,
    extractor: str = "fused",
    doc_filters=None,
) -> Dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns all stage DataFrames.

    With a StageStore, every stage is compute-or-load and appends
    per-partition lineage rows (composable stages, one table each).

    Without one, the storeless path runs the FUSED text plane
    (extract_plane: one Arrow crossing from pages to
    sentences+mentions+triples, SURVEY §2.10 batching note) and
    persists the nested plane MEMORY_AND_DISK so the several outputs
    share one computation — the in-memory analog of the stage
    checkpoints.  Both paths run identical kernels and are pinned
    equal by tests/test_pipeline_e2e.py.

    ``extractor`` picks the triple-extraction mechanism filling the M1
    slot: ``"fused"`` (pair scorer, default), or any name in the
    ``"extractor"`` registry namespace — built-ins ``"casrel"`` (the
    M3/W2 two-stage pointer decode, operators/pointer_extraction.py)
    and ``"usm"`` (the M6 unified ttl/ltl/tll pointer-algebra decode,
    operators/usm.py; both pinned to P/R >= 0.95 agreement by tests),
    or a user mechanism registered with
    ``@rex_spark.registry.register("extractor")`` (the rex registry /
    --include-package extension surface).  Registered paths always run
    the composable stages (their decoders are not part of the fused
    plane kernel).

    ``doc_filters`` (an :class:`~rex_spark.operators.docfilters.DocFilters`)
    enables corpus-quality filtering between docs and sentences —
    quality-score / repetition / language cuts plus optional PII
    scrubbing, all per-row JVM expressions (the text plane stays
    narrow).  Active filters force the composable stage path (the
    fused plane cannot see filtered docs); per-filter drop counts ride
    a single Observation — with a store they land via
    ``write_metrics("doc_filters<sfx>")`` once the docs stage commits;
    the Observation itself is returned under ``"doc_filter_metrics"``
    (None when the docs stage was resumed — read the stored metrics
    table instead).  Filtered stage names carry the filter-config
    digest so one stage root never resumes across filter settings.
    """
    from pyspark import StorageLevel

    from .operators.extraction import (
        extract_plane,
        extract_triples_fused,
        plane_mentions,
        plane_sentences,
        plane_triples,
    )
    from .registry import NAMESPACE_REGISTRY

    if extractor != "fused" and extractor not in NAMESPACE_REGISTRY["extractor"]:
        raise ValueError(
            f"unknown extractor: {extractor!r} (register it with "
            f"@register('extractor'))"
        )
    filters_active = doc_filters is not None and doc_filters.active()
    # extractor-dependent stages carry the extractor in their NAME so a
    # stage root written with one mechanism never resumes into the other
    # (extractor-independent stages — docs/sentences/mentions/surfaces/
    # entities — stay shared and ARE reused across extractors); when
    # doc filters are active EVERY stage additionally carries the
    # filter digest (all downstream content depends on the kept set)
    ext_sfx = "" if extractor == "fused" else f"_{extractor}"
    fsfx = f"_fl{doc_filters.digest()}" if filters_active else ""
    obs = None
    fresh_docs = store is None or not store.is_committed(f"docs{fsfx}")
    if filters_active:
        from pyspark.sql import Observation

        from .operators.docfilters import apply_doc_filters

        obs = Observation() if fresh_docs else None

    def make_docs():
        d = clean_pages(pages)
        if filters_active:
            d = apply_doc_filters(d, doc_filters, observation=obs)
        return d

    if extractor != "fused" or filters_active:
        _ext = (
            extract_triples_fused
            if extractor == "fused"
            else NAMESPACE_REGISTRY["extractor"][extractor]
        )

        def run(name, fn, **kw):
            return fn() if store is None else store.run(name, fn, **kw)

        docs = run(f"docs{fsfx}", make_docs)
        if store is not None and obs is not None:
            # docs stage write was a full action over the observed
            # branch -> counts are final; land them next to the lineage
            store.write_metrics(f"doc_filters{fsfx}", obs.get)
        sentences = run(f"sentences{fsfx}", lambda: segment_sentences(docs))
        if store is None:
            sentences = sentences.persist(StorageLevel.MEMORY_AND_DISK)
        triples = run(f"triples{ext_sfx}{fsfx}", lambda: _ext(sentences))
        mentions = run(f"mentions{fsfx}", lambda: detect_mentions(sentences))
        labeled = run(
            f"surfaces{fsfx}",
            lambda: canonicalize_surfaces(
                spark, mentions, driver_max_surfaces=driver_max_surfaces
            ),
        )
        if store is None:
            labeled = labeled.persist(StorageLevel.MEMORY_AND_DISK)
    elif store is None:
        plane = extract_plane(pages, include_text=include_sentence_text).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        docs = clean_pages(pages)  # lazy; forced only if the caller asks
        from pyspark.sql import functions as F

        sentences = (
            plane_sentences(plane)
            if include_sentence_text
            else plane.select(
                "url",
                F.timestamp_micros("warc_us").alias("warc_ts"),
                "lang",
                "sent_id",
            )
        )
        triples = plane_triples(plane)
        mentions = plane_mentions(plane)
        labeled = canonicalize_surfaces(
            spark, mentions, driver_max_surfaces=driver_max_surfaces
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        docs = store.run("docs", lambda: clean_pages(pages))
        sentences = store.run("sentences", lambda: segment_sentences(docs))
        triples = store.run("triples", lambda: extract_triples_fused(sentences))
        mentions = store.run("mentions", lambda: detect_mentions(sentences))
        labeled = store.run(
            "surfaces",
            lambda: canonicalize_surfaces(
                spark, mentions, driver_max_surfaces=driver_max_surfaces
            ),
        )

    if score_threshold is not None:
        # extra T3 cut over the kernel's own threshold (conf
        # pred_threshold analog) — applied before dedup/graph use
        from pyspark.sql import functions as F

        triples = triples.where(F.col("score") >= F.lit(score_threshold))

    def stage(name: str, fn, partition_by=None) -> DataFrame:
        if store is None:
            return fn()
        return store.run(name, fn, partition_by=partition_by)

    # entities sorted by id within files (point-lookup friendly); edges
    # partitioned by predicate — the low-cardinality column every graph
    # query filters on, so partition pruning applies (Iceberg analog:
    # PARTITIONED BY pred, sorted on (src, dst))
    entities = stage(
        f"entities{fsfx}",
        lambda: entities_from_labeled(labeled).sortWithinPartitions("entity_id"),
    )
    edges = stage(
        f"edges{ext_sfx}{fsfx}",
        lambda: edges_from_labeled(
            labeled, triples, salt_partitions=salt_partitions
        ).sortWithinPartitions("src", "dst"),
        partition_by=["pred"],
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
        "doc_filter_metrics": obs,
    }
