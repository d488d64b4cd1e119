"""Text-analysis ops over the documents table (training-data pipeline).

Everything here is deliberately pure pyspark.sql.functions (JVM-side,
whole-stage codegen, SQL-oracle-able): language-ID by stopword hits,
quality scoring, token counting (whitespace + word-regex), and
fingerprinting.  The reference's converter-level analogs are P1/P11/F1-F4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons (deterministic heuristic lang-ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "y"],
}

_STOPWORDS = sorted(set(w for ws in LANG_MARKERS.values() for w in ws))

_WORD_RE = r"[a-z0-9]+(?:'[a-z]+)?"  # BPE-ish word pieces


def _tokens(col):
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: counts + ratios + a composite score.

    quality_score mirrors the usual pretraining filters: penalize very
    short docs, low stopword ratio, and high punctuation density.
    """
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(_STOPWORDS))
    )
    punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    avg_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_txt"),
        F.round(avg_tok, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language-ID: argmax of marker-word hit counts, ties ->
    lexicographically-first language, zero hits -> 'und'."""
    toks = _tokens(F.col("text"))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(ws))).alias(f"s_{lang}")
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    scored = documents.select("doc_id", "lang", *scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    pick = F.coalesce(
        *[
            F.when(F.col(f"s_{lang}") == best, F.lit(lang))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    return scored.select(
        "doc_id",
        "lang",
        F.when(best > 0, pick).otherwise(F.lit("und")).alias("pred_lang"),
        best.alias("marker_hits"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace token count + regex word-piece count (tokenizer-ish
    budget estimate) per doc."""
    return documents.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), 0)).alias(
            "word_pieces"
        ),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprints: md5 of normalized text
    (portable across engines) + per-engine xxhash64 for fast joins."""
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return documents.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document (the standard
    web-corpus quality filter family; see Rae et al. 2021 "Scaling
    Language Models" App. A — fraction-of-duplicate-n-grams /
    top-token-dominance rules).

    Emits per doc: n_tokens, top_token_frac (most frequent token's
    share), rep_2gram_frac (1 - distinct/total 2-grams), and the
    ``repetitive`` verdict at the conventional thresholds (top token
    > 20% or duplicate 2-grams > 50%).  All JVM-side: one explode per
    signal, map-side partial aggregates — scales like any word count.
    """
    toks = _tokens(F.col("text"))
    base = documents.select("doc_id", toks.alias("t"))

    tok_counts = (
        base.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_c"),
        )
    )
    grams = base.select(
        "doc_id",
        F.when(
            F.size("t") >= 2,
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("g"),
    )
    gram_counts = (
        grams.select("doc_id", F.explode("g").alias("gram"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_2grams"),
            F.countDistinct("gram").alias("distinct_2grams"),
        )
    )
    top_frac = F.round(F.col("top_c") / F.col("n_tokens"), 6)
    rep_frac = F.round(
        F.when(
            F.coalesce(F.col("total_2grams"), F.lit(0)) > 0,
            1 - F.col("distinct_2grams") / F.col("total_2grams"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        tok_counts.join(gram_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            top_frac.alias("top_token_frac"),
            rep_frac.alias("rep_2gram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("top_token_frac") > 0.2) | (F.col("rep_2gram_frac") > 0.5),
        )
    )
