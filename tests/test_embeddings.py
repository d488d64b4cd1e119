"""M8 static-embedding lookup: kernel determinism, word2vec text
round-trip through the S6 reader, OOV/UNK semantics, broadcast plan."""

import os

from pyspark.sql import functions as F

from rex_spark.operators.embeddings import (
    EMB_DIM,
    EMB_VOCAB,
    embedding_lookup,
    emb_vector,
    load_or_create_embedding,
    write_embedding_text,
)


def test_emb_vector_deterministic_and_bounded():
    a = emb_vector("the")
    assert a == emb_vector("the")
    assert a != emb_vector("and")
    assert len(a) == EMB_DIM
    assert all(-1.0 <= v <= 1.0 for v in a)
    # 6-decimal rounding: text round-trip must be exact
    assert all(v == float(f"{v:.6f}") for v in a)


def test_text_roundtrip_via_s6_reader(spark, tmp_path):
    path = os.path.join(tmp_path, "emb.txt")
    write_embedding_text(path)
    emb = load_or_create_embedding(spark, path)
    rows = {r["token"]: list(r["vec"]) for r in emb.collect()}
    # header line dropped by the modal-dim filter; every vocab row back
    assert set(rows) == set(EMB_VOCAB)
    for tok in ("the", "acme", "une"):
        assert rows[tok] == emb_vector(tok)


def test_lookup_oov_zero_and_flag(spark, tmp_path):
    path = os.path.join(tmp_path, "emb.txt")
    write_embedding_text(path)
    emb = load_or_create_embedding(spark, path)
    toks = spark.createDataFrame(
        [(1, "the"), (1, "zzz-not-in-vocab"), (2, "acme")],
        ["doc_id", "token"],
    )
    out = {
        (r["doc_id"], r["token"]): (list(r["vec"]), r["is_oov"])
        for r in embedding_lookup(toks, emb).collect()
    }
    assert out[(1, "the")] == (emb_vector("the"), False)
    assert out[(2, "acme")] == (emb_vector("acme"), False)
    assert out[(1, "zzz-not-in-vocab")] == ([0.0] * EMB_DIM, True)


def test_lookup_joins_broadcast(spark, tmp_path):
    """The emb table is a dim table: the lookup must be a broadcast
    hash join (no shuffle of the token stream)."""
    path = os.path.join(tmp_path, "emb.txt")
    write_embedding_text(path)
    emb = load_or_create_embedding(spark, path)
    toks = spark.createDataFrame([(1, "the")], ["doc_id", "token"])
    plan = embedding_lookup(toks, emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
