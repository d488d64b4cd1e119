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
    FloatType,
    IntegerType,
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


def candidate_pairs(mentions: DataFrame, max_pairs_per_sentence: int = 400) -> DataFrame:
    """J1: all ordered (head, tail) mention pairs with distinct spans
    within a sentence.

    One shuffle (groupBy sentence key), then in-partition expansion.
    ``max_pairs_per_sentence`` bounds quadratic blowup on pathological
    sentences (the P9-style validity guard at web scale); dropped
    sentences are countable from the lineage metrics.
    """
    span = F.struct(
        F.col("ent_type"), F.col("start"), F.col("end"), F.col("surface")
    )
    grouped = mentions.groupBy("url", "sent_id").agg(
        F.collect_list(span).alias("ments")
    )
    # bound quadratic expansion before exploding
    grouped = grouped.where(F.size("ments") * F.size("ments") <= max_pairs_per_sentence)
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


def extract_triples_fused(sentences: DataFrame) -> DataFrame:
    """Fused sentences -> scored triples (shuffle-free production path)."""

    def triple_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for url, wts, sid, tokens in zip(
                pdf["url"], pdf["warc_ts"], pdf["sent_id"], pdf["tokens"]
            ):
                for subj, rel, obj, hs, he, ts, te, sc in extract_sentence(
                    list(tokens)
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


PLANE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("lang", StringType(), True),
        StructField("sent_id", IntegerType(), False),
        StructField("sent", StringType(), True),
        StructField("tokens", ArrayType(StringType()), True),
        StructField(
            "mentions",
            ArrayType(
                StructType(
                    [
                        StructField("ent_type", StringType(), False),
                        StructField("start", IntegerType(), False),
                        StructField("end", IntegerType(), False),
                        StructField("surface", StringType(), False),
                    ]
                )
            ),
            False,
        ),
        StructField(
            "triples",
            ArrayType(
                StructType(
                    [
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
            ),
            False,
        ),
    ]
)


def extract_plane(pages: DataFrame) -> DataFrame:
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
    """
    from ..kernels.textnorm import html_to_text, sent_seg, tokenize

    src = pages.select("url", "warc_ts", "lang", "html")

    def plane_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "url", "warc_ts", "lang", "sent_id", "sent", "tokens",
                "mentions", "triples",
            )}
            for url, ts, lang, html in zip(
                pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["html"]
            ):
                text = html_to_text(html) if html is not None else ""
                seg_lang = "zh" if lang == "zh" else "en"
                for sid, sent in enumerate(sent_seg(text, lang=seg_lang)):
                    toks = tokenize(sent, lang=seg_lang)
                    cols["url"].append(url)
                    cols["warc_ts"].append(ts)
                    cols["lang"].append(lang)
                    cols["sent_id"].append(sid)
                    cols["sent"].append(sent)
                    cols["tokens"].append(toks)
                    cols["mentions"].append(
                        [
                            {"ent_type": et, "start": s, "end": e, "surface": surf}
                            for surf, et, s, e in extract_mentions(toks)
                        ]
                    )
                    cols["triples"].append(
                        [
                            {
                                "subj": subj, "pred": rel, "obj": obj,
                                "h_start": hs, "h_end": he,
                                "t_start": tst, "t_end": te, "score": sc,
                            }
                            for subj, rel, obj, hs, he, tst, te, sc
                            in extract_sentence(toks)
                        ]
                    )
            out = pd.DataFrame(cols)
            if len(out):
                out = out.astype({"sent_id": "int32"})
            yield out

    return src.mapInPandas(plane_batches, schema=PLANE_SCHEMA)


def plane_sentences(plane: DataFrame) -> DataFrame:
    return plane.select("url", "warc_ts", "lang", "sent_id", "sent", "tokens")


def plane_mentions(plane: DataFrame) -> DataFrame:
    m = plane.select("url", "sent_id", F.explode("mentions").alias("m"))
    return m.select(
        "url", "sent_id", "m.ent_type", "m.start", "m.end", "m.surface"
    )


def plane_triples(plane: DataFrame) -> DataFrame:
    t = plane.select("url", "warc_ts", "sent_id", F.explode("triples").alias("t"))
    return t.select(
        "url", "warc_ts", "sent_id", "t.subj", "t.pred", "t.obj",
        "t.h_start", "t.h_end", "t.t_start", "t.t_end", "t.score",
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
