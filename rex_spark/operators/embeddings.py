"""Static embedding lookup as a distributed operator (SURVEY §2.10 M8).

Re-expresses rex/modules/embeddings/static_embedding.py:9-40 +
rex/data/vocab.py:64-94 Spark-first: the embedding table (loaded with
io.readers.read_embedding_text, the S6 word2vec-text reader) is a DIM
table, so the token->vector lookup is a BROADCAST hash join against the
exploded token stream — no shuffle of the big side, exactly how a
feature-materialization pass would run at 10^12 documents.  OOV tokens
map to the UNK row; the reference random-inits UNK
(vocab.py:67-68, untrained), so the deterministic engine pins UNK = the
zero vector and counts OOV hits per document (the count the reference's
build_emb vocab-intersection step logs, rex/utils/build_emb.py:42-44).

Vector generation for the deterministic vocabulary is a frozen kernel
(``emb_vector``): splitmix64 bits seeded from md5(token) — stable
across processes, replicated verbatim by the in-process gold
(rex_spark/oracle_gold.py) so the oracle certifies the distributed
join+aggregate orchestration, not the arithmetic.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.hashing import splitmix64

EMB_DIM = 4

# Deterministic demo vocabulary: the lang-id marker words (textstats)
# plus a handful of gazetteer tokens — fixed, so every side (Spark job,
# text file, DuckDB gold) derives the identical table with no data-
# dependent vocab scan.
EMB_VOCAB: List[str] = sorted(
    {
        "der", "die", "das", "und", "ist", "nicht",
        "the", "and", "of", "is", "to", "a",
        "el", "los", "las", "es", "una", "y",
        "le", "la", "les", "et", "est", "une",
        "acme", "globex", "initech", "alice", "bob", "springfield",
    }
)


def emb_vector(token: str, dim: int = EMB_DIM) -> List[float]:
    """Frozen token->vector kernel: dim floats in (-1, 1), each from
    one splitmix64 step seeded by md5(token) — rounded to 6 decimals so
    the text round-trip (word2vec format) is exact."""
    seed = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")
    state = seed
    out = []
    for _ in range(dim):
        state = splitmix64(state)
        out.append(round((state / float(1 << 63)) - 1.0, 6))
    return out


def write_embedding_text(path: str, vocab: List[str] | None = None,
                         dim: int = EMB_DIM) -> str:
    """Write the deterministic vocabulary in word2vec text format
    (``N dim`` header + one ``token v1..vd`` line per token) — the
    artifact read_embedding_text consumes."""
    vocab = EMB_VOCAB if vocab is None else vocab
    bad = [t for t in vocab if not t or any(c.isspace() for c in t)]
    if bad:
        # the format is whitespace-delimited: such a token would be
        # silently split into token+vector garbage on read-back
        raise ValueError(f"tokens with whitespace break word2vec text: {bad[:3]}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"{len(vocab)} {dim}\n")
        for tok in vocab:
            vec = " ".join(f"{v:.6f}" for v in emb_vector(tok, dim))
            fh.write(f"{tok} {vec}\n")
    os.replace(tmp, path)
    return path


def embedding_lookup(tokens_df: DataFrame, emb: DataFrame) -> DataFrame:
    """Per-token lookup: (doc_id, pos, token) x emb(token, vec) ->
    (doc_id, pos, token, vec, is_oov).  OOV -> zero vector (UNK row).

    ``emb`` is the read_embedding_text output (token, vec) — a dim
    table, hence broadcast: the big token stream never shuffles.
    """
    dim = EMB_DIM
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    joined = tokens_df.join(F.broadcast(emb), "token", "left")
    return joined.select(
        *[c for c in tokens_df.columns],
        F.coalesce(F.col("vec"), zero).alias("vec"),
        F.col("vec").isNull().alias("is_oov"),
    )


def document_embedding_features(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Per-document pooled features from the broadcast lookup:
    (doc_id, n_tokens, n_oov, f0..f{dim-1}) where f = mean over ALL
    token vectors with OOV as the zero UNK row (mean pooling — the
    aggregate is a plain groupBy with map-side partials)."""
    from .textstats import _tokens  # the ONE normalize/split expression
    # shared with the DuckDB _TOKS oracle replica

    exploded = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    )
    looked = embedding_lookup(exploded, emb)
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("is_oov").cast("long")).alias("n_oov"),
    ]
    for j in range(EMB_DIM):
        aggs.append(
            F.round(F.avg(F.element_at("vec", j + 1)), 6).alias(f"f{j}")
        )
    return looked.groupBy("doc_id").agg(*aggs)


def load_or_create_embedding(
    spark: SparkSession, path: str, vocab: List[str] | None = None
) -> DataFrame:
    """Materialize the deterministic word2vec text file and load it
    through the S6 reader (the real file surface, header and
    dim-filter included).  Always rewritten (atomic os.replace): a
    stale file from an older vocab/kernel would silently diverge from
    the freshly regenerated parquet gold — the oracle contract is
    'regenerates bit-identically on demand', so regenerate."""
    from ..io.readers import read_embedding_text

    write_embedding_text(path, vocab)
    return read_embedding_text(spark, path)


def gold_embedding_rows(vocab: List[str] | None = None,
                        dim: int = EMB_DIM) -> Dict[str, list]:
    """(token, v0..v{dim-1}) columns for the materialized gold — the
    same kernel the text file is written from."""
    vocab = EMB_VOCAB if vocab is None else vocab
    cols: Dict[str, list] = {"token": list(vocab)}
    for j in range(dim):
        cols[f"v{j}"] = []
    for tok in vocab:
        vec = emb_vector(tok, dim)
        for j in range(dim):
            cols[f"v{j}"].append(vec[j])
    return cols
