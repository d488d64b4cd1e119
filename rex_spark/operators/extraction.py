"""Extraction plane: mentions (NER), candidate pairs (J1), scored triples.

Two equivalent paths, both built on the same kernels:

1. **Composable stages** — ``detect_mentions`` -> ``candidate_pairs``
   -> ``score_pairs``: each intermediate is a real DataFrame you can
   checkpoint/inspect (REx exposes the same intermediates: entity
   lists, candidate pairs per rex/data/transforms/sent_re.py:50-63,
   per-pair scores per rex/models/sent_pcnn.py).

2. **Fused path** — ``extract_triples_fused``: sentences -> scored
   triples in ONE mapInPandas.  Mentions and pairs never leave the
   executor, so the whole text->triple pipeline is shuffle-free; this
   is the production path at 10^12 documents.  The e2e test asserts
   both paths emit identical triple sets.

Candidate generation avoids a two-sided shuffle join: mentions are
grouped per sentence (one shuffle) and pairs expand in-partition via
explode, rather than self-joining the mentions table (two shuffles +
skew on hot sentences).
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..kernels.extractor import extract_mentions, extract_sentence, score_pair

MENTIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_id", IntegerType(), False),
        StructField("ent_type", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("surface", StringType(), False),
    ]
)

TRIPLES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("sent_id", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("h_start", IntegerType(), False),
        StructField("h_end", IntegerType(), False),
        StructField("t_start", IntegerType(), False),
        StructField("t_end", IntegerType(), False),
        StructField("score", FloatType(), False),
    ]
)


def detect_mentions(sentences: DataFrame) -> DataFrame:
    """sentences -> one row per typed entity span (W1/M4 role)."""

    def mention_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for url, sid, tokens in zip(pdf["url"], pdf["sent_id"], pdf["tokens"]):
                for surface, etype, s, e in extract_mentions(list(tokens)):
                    rows.append((url, sid, etype, s, e, surface))
            yield pd.DataFrame(
                rows, columns=["url", "sent_id", "ent_type", "start", "end", "surface"]
            ).astype(
                {"sent_id": "int32", "start": "int32", "end": "int32"}
                if rows
                else {}
            )

    return sentences.select("url", "sent_id", "tokens").mapInPandas(
        mention_batches, schema=MENTIONS_SCHEMA
    )


def filter_valid_mentions(
    mentions: DataFrame, max_seq_len: int, observation=None
) -> tuple[DataFrame, DataFrame]:
    """P9 (rex/data/transforms/sent_re.py:44-58): drop mentions whose
    span exceeds the model's max sequence length.  Returns
    (kept, dropped); the reference logs exactly that drop count per
    transform — pass a pyspark Observation to fold the count into the
    caller's first action (zero extra jobs), then land it via
    StageStore.write_metrics.

    Observation caveat: the counts are valid only after a FULL action
    over one branch (e.g. kept.count(), as the pipeline and tests do).
    Observation.get returns after the FIRST action touching the
    observed plan — a partial scan (first()/limit) or an action on the
    dropped branch would report that job's partial/complementary pass,
    not a full input count."""
    fits = F.col("end") <= max_seq_len
    if observation is not None:
        mentions = mentions.observe(
            observation,
            F.sum((~fits).cast("long")).alias("dropped_mentions"),
            F.count(F.lit(1)).alias("input_mentions"),
        )
    return mentions.where(fits), mentions.where(~fits)


def candidate_pairs(
    mentions: DataFrame,
    max_pairs_per_sentence: int = 400,
    observation=None,
) -> DataFrame:
    """J1: all ordered (head, tail) mention pairs with distinct spans
    within a sentence.

    One shuffle (groupBy sentence key), then in-partition expansion.
    ``max_pairs_per_sentence`` bounds quadratic blowup on pathological
    sentences (the P9-style validity guard at web scale).  The cap
    drops WHOLE sentences; pass a pyspark Observation and the dropped
    sentence/pair counts are measured by the same job that produces
    the pairs (observe() rides the groupBy output — no extra scan),
    mirroring the reference's per-transform drop logging
    (rex/data/transforms/sent_re.py:44-58); land them via
    StageStore.write_metrics.
    """
    span = F.struct(
        F.col("ent_type"), F.col("start"), F.col("end"), F.col("surface")
    )
    grouped = mentions.groupBy("url", "sent_id").agg(
        F.collect_list(span).alias("ments")
    )
    over = F.size("ments") * F.size("ments") > max_pairs_per_sentence
    if observation is not None:
        grouped = grouped.observe(
            observation,
            F.sum(over.cast("long")).alias("dropped_sentences"),
            F.sum(
                F.when(over, F.size("ments") * (F.size("ments") - 1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("dropped_pairs"),
            F.count(F.lit(1)).alias("input_sentences"),
        )
    # bound quadratic expansion before exploding
    grouped = grouped.where(~over)
    pairs = (
        grouped.select(
            "url",
            "sent_id",
            F.explode("ments").alias("head"),
            F.col("ments"),
        )
        .select("url", "sent_id", "head", F.explode("ments").alias("tail"))
        .where(
            (F.col("head.start") != F.col("tail.start"))
            | (F.col("head.end") != F.col("tail.end"))
        )
    )
    return pairs


def score_pairs(pairs: DataFrame, sentences: DataFrame) -> DataFrame:
    """M1 role: per-pair relation scores via the deterministic kernel.

    Joins pair rows back to sentence tokens (broadcast is wrong here —
    both sides are big — so this is a co-partitioned shuffle join on
    the sentence key), then scores in Arrow batches and thresholds
    (T3) + dedups keep-best per (url, sent_id, subj, pred, obj).
    """
    withtok = pairs.join(
        sentences.select("url", "warc_ts", "sent_id", "tokens"), ["url", "sent_id"]
    )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for url, wts, sid, head, tail, tokens in zip(
                pdf["url"], pdf["warc_ts"], pdf["sent_id"],
                pdf["head"], pdf["tail"], pdf["tokens"],
            ):
                toks = list(tokens)
                h = (head["surface"], head["ent_type"], head["start"], head["end"])
                t = (tail["surface"], tail["ent_type"], tail["start"], tail["end"])
                scored = score_pair(toks, h, t)
                if scored is None:
                    continue
                rel, sc = scored
                rows.append(
                    (url, wts, sid, h[0], rel, t[0], h[2], h[3], t[2], t[3], sc)
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "sent_id", "subj", "pred", "obj",
                    "h_start", "h_end", "t_start", "t_end", "score",
                ],
            )
            if rows:
                out = out.astype(
                    {
                        "sent_id": "int32", "h_start": "int32", "h_end": "int32",
                        "t_start": "int32", "t_end": "int32", "score": "float32",
                    }
                )
            yield out

    scored = withtok.mapInPandas(score_batches, schema=TRIPLES_SCHEMA)
    return dedup_keep_best(scored, ["url", "sent_id", "subj", "pred", "obj"])


def extract_triples_fused(
    sentences: DataFrame, max_pairs_per_sentence: int | None = 400
) -> DataFrame:
    """Fused sentences -> scored triples (shuffle-free production path).

    Shares extract_sentence's pair-cap contract with extract_plane:
    over-cap sentences take the exact gap-banded linear path (never
    dropped, identical output); pass None for the reference-exact
    quadratic kernel."""

    def triple_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for url, wts, sid, tokens in zip(
                pdf["url"], pdf["warc_ts"], pdf["sent_id"], pdf["tokens"]
            ):
                for subj, rel, obj, hs, he, ts, te, sc in extract_sentence(
                    list(tokens), max_pairs=max_pairs_per_sentence
                ):
                    rows.append((url, wts, sid, subj, rel, obj, hs, he, ts, te, sc))
            out = pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "sent_id", "subj", "pred", "obj",
                    "h_start", "h_end", "t_start", "t_end", "score",
                ],
            )
            if rows:
                out = out.astype(
                    {
                        "sent_id": "int32", "h_start": "int32", "h_end": "int32",
                        "t_start": "int32", "t_end": "int32", "score": "float32",
                    }
                )
            yield out

    return sentences.select("url", "warc_ts", "sent_id", "tokens").mapInPandas(
        triple_batches, schema=TRIPLES_SCHEMA
    )


# Mentions and triples travel as PARALLEL PRIMITIVE ARRAYS, not
# array<struct>: pyarrow converts list<string>/list<int> columns on a
# C fast path, while list-of-dict struct columns fall back to per-
# element Python iteration — measurably slower at millions of spans
# per batch.  arrays_zip on the JVM side reassembles the structs.
# warc_ts crosses the UDF boundary as int64 epoch-micros (warc_us):
# timestamp columns pay tz/unit conversion per element on both sides
# of the Arrow boundary, a plain long does not; plane_sentences /
# plane_triples convert back with timestamp_micros (JVM-side, free).
PLANE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_us", LongType(), False),
        StructField("lang", StringType(), True),
        StructField("sent_id", IntegerType(), False),
        StructField("sent", StringType(), True),
        StructField("tokens", ArrayType(StringType()), True),
        StructField("m_type", ArrayType(StringType()), False),
        StructField("m_start", ArrayType(IntegerType()), False),
        StructField("m_end", ArrayType(IntegerType()), False),
        StructField("m_surface", ArrayType(StringType()), False),
        StructField("t_subj", ArrayType(StringType()), False),
        StructField("t_pred", ArrayType(StringType()), False),
        StructField("t_obj", ArrayType(StringType()), False),
        StructField("t_hs", ArrayType(IntegerType()), False),
        StructField("t_he", ArrayType(IntegerType()), False),
        StructField("t_ts", ArrayType(IntegerType()), False),
        StructField("t_te", ArrayType(IntegerType()), False),
        StructField("t_score", ArrayType(FloatType()), False),
        StructField("t_capped", BooleanType(), False),
    ]
)


def extract_plane(
    pages: DataFrame,
    include_text: bool = True,
    max_pairs_per_sentence: int | None = 400,
) -> DataFrame:
    """pages -> per-sentence rows with nested mention/triple arrays, in
    ONE Arrow crossing.

    The composable stages (clean_pages -> segment_sentences ->
    detect_mentions / extract_triples_fused) each pay a full
    JVM->Arrow->pandas->Arrow->JVM round trip over the whole text
    plane; at benchmark scale those crossings dominate the actual
    kernel CPU.  This operator runs the same kernels back to back
    inside one mapInPandas and leaves the fan-out to JVM-side
    ``explode`` (plane_mentions / plane_triples), which is narrow and
    cheap.  Output is pinned identical to the composable path by
    tests/test_pipeline_e2e.py.

    ``max_pairs_per_sentence`` bounds the kernel's quadratic pair loop
    on pathological sentences (a page whose "sentence" repeats a
    gazetteer surface thousands of times would otherwise stall one
    executor core).  Over-cap sentences are NOT dropped: they route to
    the exact gap-banded linear path (extract_sentence_banded — output
    provably identical to the uncapped kernel) and emit with
    ``t_capped`` true so downstream lineage can still count them (P9
    contract).  The store-path extract_triples_fused shares the same
    kernel call, so both planes recover identically by construction.
    """
    import pyarrow as pa

    from ..kernels.textnorm import html_to_text, sent_seg, tokenize

    src = pages.select(
        "url", F.unix_micros("warc_ts").alias("warc_us"), "lang", "html"
    )

    # Catalyst cannot prune columns THROUGH a map-in-arrow UDF, so
    # pruning is an operator parameter: consumers that only need
    # mentions + triples (the KG pipeline's graph plane) skip
    # materializing the sentence text and token arrays — roughly half
    # the Arrow bytes.
    schema = (
        PLANE_SCHEMA
        if include_text
        else StructType(
            [f for f in PLANE_SCHEMA.fields if f.name not in ("sent", "tokens")]
        )
    )
    names = [f.name for f in schema.fields]
    pa_types = {
        "url": pa.string(), "warc_us": pa.int64(), "lang": pa.string(),
        "sent_id": pa.int32(), "sent": pa.string(),
        "tokens": pa.list_(pa.string()),
        "m_type": pa.list_(pa.string()), "m_start": pa.list_(pa.int32()),
        "m_end": pa.list_(pa.int32()), "m_surface": pa.list_(pa.string()),
        "t_subj": pa.list_(pa.string()), "t_pred": pa.list_(pa.string()),
        "t_obj": pa.list_(pa.string()), "t_hs": pa.list_(pa.int32()),
        "t_he": pa.list_(pa.int32()), "t_ts": pa.list_(pa.int32()),
        "t_te": pa.list_(pa.int32()), "t_score": pa.list_(pa.float32()),
        "t_capped": pa.bool_(),
    }
    out_schema = pa.schema([(n, pa_types[n]) for n in names])

    # mapInArrow, not mapInPandas: RecordBatches in and out, no pandas
    # block construction / dtype inference on either side of the
    # boundary — at millions of rows that layer is pure overhead.
    def plane_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            cols = {k: [] for k in names}
            for url, us, lang, html in zip(
                rb.column(0).to_pylist(),
                rb.column(1).to_pylist(),
                rb.column(2).to_pylist(),
                rb.column(3).to_pylist(),
            ):
                text = html_to_text(html) if html is not None else ""
                seg_lang = "zh" if lang == "zh" else "en"
                for sid, sent in enumerate(sent_seg(text, lang=seg_lang)):
                    toks = tokenize(sent, lang=seg_lang)
                    cols["url"].append(url)
                    cols["warc_us"].append(us)
                    cols["lang"].append(lang)
                    cols["sent_id"].append(sid)
                    if include_text:
                        cols["sent"].append(sent)
                        cols["tokens"].append(toks)
                    ms = extract_mentions(toks)
                    cols["m_surface"].append([m[0] for m in ms])
                    cols["m_type"].append([m[1] for m in ms])
                    cols["m_start"].append([m[2] for m in ms])
                    cols["m_end"].append([m[3] for m in ms])
                    capped = (
                        max_pairs_per_sentence is not None
                        and len(ms) * len(ms) > max_pairs_per_sentence
                    )
                    cols["t_capped"].append(capped)
                    # over-cap sentences take the exact gap-banded
                    # linear path inside extract_sentence (flagged,
                    # never dropped)
                    tr = extract_sentence(toks, max_pairs=max_pairs_per_sentence)
                    cols["t_subj"].append([t[0] for t in tr])
                    cols["t_pred"].append([t[1] for t in tr])
                    cols["t_obj"].append([t[2] for t in tr])
                    cols["t_hs"].append([t[3] for t in tr])
                    cols["t_he"].append([t[4] for t in tr])
                    cols["t_ts"].append([t[5] for t in tr])
                    cols["t_te"].append([t[6] for t in tr])
                    cols["t_score"].append([t[7] for t in tr])
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[n], type=pa_types[n]) for n in names],
                schema=out_schema,
            )

    return src.mapInArrow(plane_batches, schema=schema)


def plane_sentences(plane: DataFrame) -> DataFrame:
    return plane.select(
        "url",
        F.timestamp_micros("warc_us").alias("warc_ts"),
        "lang",
        "sent_id",
        "sent",
        "tokens",
    )


def plane_mentions(plane: DataFrame) -> DataFrame:
    m = plane.select(
        "url",
        "sent_id",
        F.explode(
            F.arrays_zip("m_type", "m_start", "m_end", "m_surface")
        ).alias("m"),
    )
    return m.select(
        "url",
        "sent_id",
        F.col("m.m_type").alias("ent_type"),
        F.col("m.m_start").alias("start"),
        F.col("m.m_end").alias("end"),
        F.col("m.m_surface").alias("surface"),
    )


def plane_triples(plane: DataFrame) -> DataFrame:
    t = plane.select(
        "url",
        F.timestamp_micros("warc_us").alias("warc_ts"),
        "sent_id",
        F.explode(
            F.arrays_zip(
                "t_subj", "t_pred", "t_obj", "t_hs", "t_he", "t_ts", "t_te",
                "t_score",
            )
        ).alias("t"),
    )
    return t.select(
        "url",
        "warc_ts",
        "sent_id",
        F.col("t.t_subj").alias("subj"),
        F.col("t.t_pred").alias("pred"),
        F.col("t.t_obj").alias("obj"),
        F.col("t.t_hs").alias("h_start"),
        F.col("t.t_he").alias("h_end"),
        F.col("t.t_ts").alias("t_start"),
        F.col("t.t_te").alias("t_end"),
        F.col("t.t_score").alias("score"),
    )


def dedup_keep_best(triples: DataFrame, keys: List[str]) -> DataFrame:
    """Keep the highest-scoring row per key (the one window op we add
    beyond the reference, SURVEY.md §2.5): max_by over a groupBy — no
    full sort, map-side partial aggregation, skew-safe under AQE."""
    others = [c for c in triples.columns if c not in keys]
    agg = triples.groupBy(*keys).agg(
        F.max_by(F.struct(*others), F.col("score")).alias("_best")
    )
    return agg.select(*keys, *[F.col(f"_best.{c}").alias(c) for c in others])


def document_triple_set(triples: DataFrame) -> DataFrame:
    """Distinct (url, subj, pred, obj) — the comparable unit of
    rex/metrics/triple.py:14-19."""
    return triples.select("url", "subj", "pred", "obj").distinct()
