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


def quality_exprs(col) -> dict:
    """Per-row quality signal EXPRESSIONS (no shuffle), shared by
    :func:`doc_stats` and the pipeline doc filters
    (operators/docfilters.py) so both surfaces stay in lockstep by
    construction.  ``col`` is any string Column."""
    toks = _tokens(col)
    n_tokens = F.size(toks)
    n_chars = F.length(col)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(_STOPWORDS))
    )
    punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    avg_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "avg_token_len": F.round(avg_tok, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "quality_score": F.round(quality, 4),
    }


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: counts + ratios + a composite score.

    quality_score mirrors the usual pretraining filters: penalize very
    short docs, low stopword ratio, and high punctuation density.
    """
    q = quality_exprs(F.col("text"))
    return documents.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["n_chars"].alias("n_chars_txt"),
        q["avg_token_len"].alias("avg_token_len"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["quality_score"].alias("quality_score"),
    )


def lang_exprs(col) -> dict:
    """Per-row language-ID EXPRESSIONS (argmax of marker-word hits,
    ties -> lexicographically-first language, zero hits -> 'und'),
    shared by :func:`lang_id` and the pipeline doc filters."""
    toks = _tokens(col)
    # NB: pyspark HOF lambdas must be unary (a second parameter is
    # interpreted as the element INDEX); the comprehension evaluates
    # F.filter eagerly, so the closure over ws is safe
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(ws)))
        for lang, ws in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    pick = F.coalesce(
        *[F.when(scores[lang] == best, F.lit(lang)) for lang in sorted(scores)]
    )
    return {
        "pred_lang": F.when(best > 0, pick).otherwise(F.lit("und")),
        "marker_hits": best,
    }


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language-ID: argmax of marker-word hit counts, ties ->
    lexicographically-first language, zero hits -> 'und'."""
    e = lang_exprs(F.col("text"))
    return documents.select(
        "doc_id",
        "lang",
        e["pred_lang"].alias("pred_lang"),
        e["marker_hits"].alias("marker_hits"),
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


def repetition_exprs(col, max_tokens: int | None = 4096) -> dict:
    """Per-row repetition signal EXPRESSIONS — the narrow (shuffle-free)
    formulation of :func:`repetition_stats` for use inside the KG
    pipeline's document filters.

    ``repetition_stats`` computes the same signals with
    explode + groupBy (two shuffles) because that shape is
    SQL-oracle-able; a filter sitting between the docs and sentences
    stages must NOT introduce a shuffle into the otherwise-narrow text
    plane, so here the same values come from array higher-order
    functions evaluated per row:

    - ``top_token_frac``: max multiplicity via
      ``array_max(transform(array_distinct(t), d -> size(filter(t, x -> x = d))))``
      — O(distinct x n) per row, all JVM-side;
    - ``rep_2gram_frac``: ``1 - size(array_distinct(g)) / size(g)``.

    ``max_tokens`` caps the per-row cost on pathological documents
    (signal computed over the first N tokens — the standard
    quality-classifier truncation); tests pin expr == groupBy
    formulation exactly for docs under the cap and assert the test
    corpus never reaches it (same lockstep-cap pattern as the
    candidate-pair cap).
    """
    toks = _tokens(col)
    t = F.slice(toks, 1, max_tokens) if max_tokens else toks
    n = F.size(t)
    top_count = F.array_max(
        F.transform(
            F.array_distinct(t), lambda d: F.size(F.filter(t, lambda x: x == d))
        )
    )
    grams = F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(0), n - 2), lambda i: F.concat(F.element_at(t, i + 1), F.lit(" "), F.element_at(t, i + 2))),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    top_frac = F.round(
        F.when(n > 0, top_count / n).otherwise(F.lit(0.0)), 6
    )
    rep_frac = F.round(
        F.when(n_grams > 0, 1 - F.size(F.array_distinct(grams)) / n_grams)
        .otherwise(F.lit(0.0)),
        6,
    )
    return {
        "n_tokens": n,
        "top_token_frac": top_frac,
        "rep_2gram_frac": rep_frac,
    }


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
