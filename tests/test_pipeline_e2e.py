"""End-to-end pipeline contracts (BASELINE.json):

1. clean_text is byte-identical per url to the in-process reference
   extractor (the F12 invariant);
2. the distributed triple set matches the in-process reference
   extractor at P/R >= 0.95 per rex/metrics/triple.py facets (exact
   match expected: same frozen kernels);
3. the composable stage path (mentions -> pairs -> score) and the
   fused path emit identical triple sets;
4. planted facts are recovered at the canonical-graph level, and
   surface variants merge (a~b, b~c => one component);
5. distributed faceted PRF1 agrees with the in-process kernel.
"""

import pytest

from rex_spark.kernels import kb
from rex_spark.kernels.extractor import document_triples
from rex_spark.kernels.metrics import measure_triple
from rex_spark.kernels.synth import make_pages
from rex_spark.kernels.textnorm import html_to_text
from rex_spark.operators.extraction import (
    candidate_pairs,
    detect_mentions,
    document_triple_set,
    score_pairs,
)
from rex_spark.operators.metrics import triple_prf1_dict
from rex_spark.pipeline import build_pages_df, run_pipeline

N_PAGES = 120


@pytest.fixture(scope="module")
def corpus(spark):
    pages_df = build_pages_df(spark, N_PAGES, seed=42)
    result = run_pipeline(spark, pages_df, store=None, salt_partitions=4)
    raw_pages, planted = make_pages(N_PAGES, seed=42)
    return pages_df, result, raw_pages, planted


def test_clean_text_byte_identical(corpus):
    _, result, raw_pages, _ = corpus
    got = {r["url"]: r["clean_text"] for r in result["docs"].collect()}
    assert len(got) == N_PAGES
    for p in raw_pages:
        expected = html_to_text(p["html"])
        assert got[p["url"]].encode("utf-8") == expected.encode("utf-8"), p["url"]


def test_triples_match_reference_extractor(corpus):
    _, result, raw_pages, _ = corpus
    spark_triples = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in result["triple_set"].collect()
    }
    ref_triples = set()
    for p in raw_pages:
        clean = html_to_text(p["html"])
        for s, r, o in document_triples(clean, p["lang"]):
            ref_triples.add((p["url"], s, r, o))
    assert ref_triples, "reference extractor produced no triples"
    # P/R >= 0.95 required; identical kernels should give exact equality
    tp = len(spark_triples & ref_triples)
    precision = tp / len(spark_triples)
    recall = tp / len(ref_triples)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert spark_triples == ref_triples


def test_stage_path_equals_fused_path(spark, corpus):
    _, result, _, _ = corpus
    mentions = detect_mentions(result["sentences"])
    pairs = candidate_pairs(mentions)
    staged = score_pairs(pairs, result["sentences"])
    staged_set = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"], r["score"])
        for r in staged.collect()
    }
    fused_set = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"], r["score"])
        for r in result["triples"].collect()
    }
    assert staged_set == fused_set


def test_planted_facts_in_graph(corpus):
    _, result, _, planted = corpus
    entities = result["entities"].collect()
    edges = result["edges"].collect()
    surf2canon = {}
    for canon, (_t, surfs) in kb.ENTITIES.items():
        for s in surfs:
            key = " ".join(s.split()) if not kb._is_zh(s) else " ".join(s)
            surf2canon[key] = canon
    # entity_id -> KB canonical (via any member surface)
    ent2canon = {}
    for e in entities:
        canons = {surf2canon[s] for s in e["surfaces"] if s in surf2canon}
        assert len(canons) <= 1, f"over-merged entity: {e['surfaces']} -> {canons}"
        if canons:
            ent2canon[e["entity_id"]] = canons.pop()
    graph_facts = {
        (ent2canon[r["src"]], r["pred"], ent2canon[r["dst"]])
        for r in edges
        if r["src"] in ent2canon and r["dst"] in ent2canon
    }
    missing = {(s, r, o) for _u, s, r, o in planted} - graph_facts
    assert not missing, f"planted facts missing from graph: {missing}"


def test_surface_variants_merge_transitively(corpus):
    _, result, _, _ = corpus
    entities = {
        frozenset(e["surfaces"]): e for e in result["entities"].collect()
    }
    merged = {}
    for surfaces, e in entities.items():
        for s in surfaces:
            merged[s] = e["entity_id"]
    # acme variants must share one component wherever they appear
    acme_ids = {
        merged[s] for s in ("acme corporation", "acme corp", "the acme company")
        if s in merged
    }
    assert len(acme_ids) == 1
    # hub support: acme should be among the highest-mention entities
    top = max(result["entities"].collect(), key=lambda e: e["n_mentions"])
    assert "acme" in top["canonical"] or top["n_mentions"] > 0


def test_distributed_prf1_matches_kernel(spark, corpus):
    _, result, raw_pages, _ = corpus
    pred = result["triple_set"]
    # gold: reference extractor output as a DataFrame
    gold_rows = []
    ref_by_url = {}
    for p in raw_pages:
        clean = html_to_text(p["html"])
        ts = document_triples(clean, p["lang"])
        ref_by_url[p["url"]] = ts
        gold_rows += [(p["url"], s, r, o) for s, r, o in ts]
    gold = spark.createDataFrame(gold_rows, ["url", "subj", "pred", "obj"])

    dist = triple_prf1_dict(pred, gold)

    pred_by_url = {}
    for r in pred.collect():
        pred_by_url.setdefault(r["url"], []).append((r["subj"], r["pred"], r["obj"]))
    urls = sorted(set(pred_by_url) | set(ref_by_url))
    inproc = measure_triple(
        [pred_by_url.get(u, []) for u in urls],
        [ref_by_url.get(u, []) for u in urls],
    )
    for facet in ("triple", "subject", "object", "relation"):
        for k in ("tp", "fp", "fn"):
            assert dist[facet][k] == inproc[facet][k], (facet, k)
        assert dist[facet]["f1"] == pytest.approx(inproc[facet]["f1"])
    assert dist["triple"]["f1"] == 1.0


def test_distributed_synthesis_identical(spark):
    """Executor-side corpus generation is byte-identical to the
    driver-side loop (make_page depends only on (seed, i))."""
    from rex_spark.pipeline import build_pages_df_distributed

    a = build_pages_df(spark, 60, seed=42).orderBy("url").collect()
    b = (
        build_pages_df_distributed(spark, 60, seed=42, partitions=4)
        .orderBy("url")
        .collect()
    )
    assert a == b


def test_fused_plane_matches_composable_stages(spark):
    """extract_plane (one Arrow crossing) must emit exactly the same
    sentences, mentions and triples as the composable stage chain."""
    from rex_spark.operators.extraction import (
        extract_plane,
        extract_triples_fused,
        plane_mentions,
        plane_sentences,
        plane_triples,
    )
    from rex_spark.operators.textplane import clean_pages, segment_sentences

    pages = build_pages_df(spark, 80, seed=42)
    plane = extract_plane(pages)
    sents_ref = segment_sentences(clean_pages(pages))

    def rows(df, arr_cols=("tokens",)):
        out = set()
        for r in df.collect():
            d = r.asDict()
            for c in arr_cols:
                if c in d:
                    d[c] = tuple(d[c])
            out.add(tuple(sorted(d.items())))
        return out

    assert rows(plane_sentences(plane)) == rows(sents_ref)
    assert rows(plane_mentions(plane), ()) == rows(detect_mentions(sents_ref), ())
    assert rows(plane_triples(plane), ()) == rows(
        extract_triples_fused(sents_ref), ()
    )


def test_run_pipeline_casrel_extractor(spark):
    """extractor='casrel' swaps the M1 slot for the pointer decoder:
    the pipeline's triple set equals a direct casrel_extract, and the
    graph plane still materializes."""
    from rex_spark.operators.pointer_extraction import casrel_extract
    from rex_spark.operators.textplane import clean_pages, segment_sentences

    pages = build_pages_df(spark, 60, seed=42)
    r = run_pipeline(spark, pages, store=None, extractor="casrel")
    key = ["url", "subj", "pred", "obj"]
    got = {tuple(x) for x in r["triple_set"].select(*key).collect()}
    want = {
        tuple(x)
        for x in casrel_extract(segment_sentences(clean_pages(pages)))
        .select(*key)
        .distinct()
        .collect()
    }
    assert got == want and got
    assert r["entities"].count() > 0 and r["edges"].count() > 0

    with pytest.raises(ValueError):
        run_pipeline(spark, pages, store=None, extractor="nope")


def test_casrel_pointer_path_agrees_with_pair_scorer(spark):
    """The CasRel-style pointer decode (M3+W2) must agree with the
    pair-scoring extractor at P/R >= 0.95 on document triple sets
    (exact equality is impossible: pointer vectors cannot express
    nested mentions with distinct ends)."""
    from rex_spark.operators.extraction import extract_triples_fused
    from rex_spark.operators.pointer_extraction import casrel_extract
    from rex_spark.operators.textplane import clean_pages, segment_sentences

    sents = segment_sentences(clean_pages(build_pages_df(spark, 120, seed=42)))
    key = ["url", "subj", "pred", "obj"]
    a = extract_triples_fused(sents).select(*key).distinct()
    b = casrel_extract(sents).select(*key).distinct()
    scores = triple_prf1_dict(b, a)["triple"]
    assert scores["p"] >= 0.95 and scores["r"] >= 0.95, scores


def test_run_pipeline_usm_extractor(spark):
    """extractor='usm' swaps the M1 slot for the M6 unified pointer-
    algebra decode: the pipeline's triple set equals the fused path on
    this corpus (measured exact; contract is >= 0.95), the scored rows
    carry the pair scorer's score, and the graph plane materializes."""
    pages = build_pages_df(spark, 60, seed=42)
    r = run_pipeline(spark, pages, store=None, extractor="usm")
    key = ["url", "subj", "pred", "obj"]
    got = {tuple(x) for x in r["triple_set"].select(*key).collect()}
    fused = run_pipeline(spark, pages, store=None)
    want = {tuple(x) for x in fused["triple_set"].select(*key).collect()}
    assert got == want and got
    assert r["entities"].count() > 0 and r["edges"].count() > 0
    scores = [x["score"] for x in r["triples"].select("score").collect()]
    assert scores and all(s > 0 for s in scores)


def test_distributed_synthesis_waves_union_to_full_corpus(spark):
    """build_pages_df_distributed(start=...) waves are disjoint and
    union byte-identically to the single full-range synthesis — the
    property the streaming soak's batch-parity check rests on."""
    from rex_spark.pipeline import build_pages_df_distributed

    full = build_pages_df_distributed(spark, 40, seed=42)
    w0 = build_pages_df_distributed(spark, 20, seed=42, start=0)
    w1 = build_pages_df_distributed(spark, 20, seed=42, start=20)
    union = w0.unionByName(w1)
    assert union.count() == full.count() == 40
    assert full.exceptAll(union).count() == 0
    assert union.exceptAll(full).count() == 0
