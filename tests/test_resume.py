"""Resumability contract: a job killed mid-pipeline resumes from the
last committed stage (no recompute), produces identical final triples,
and every committed stage carries per-partition lineage rows."""

import os

import pytest

from rex_spark.io.stages import StageStore
from rex_spark.pipeline import build_pages_df, run_pipeline

N_PAGES = 60


@pytest.fixture()
def pages(spark):
    return build_pages_df(spark, N_PAGES, seed=42)


def _triple_set(result):
    return {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in result["triple_set"].collect()
    }


def test_resume_after_partial_failure(spark, pages, tmp_path):
    root = str(tmp_path / "stages")

    # full run -> golden outputs
    store = StageStore(spark, root)
    golden = _triple_set(run_pipeline(spark, pages, store=store))
    committed = sorted(
        d for d in os.listdir(root) if not d.startswith("_")
    )
    assert committed == ["docs", "edges", "entities", "mentions",
                         "sentences", "surfaces", "triples"]

    # simulate a crash mid-pipeline: later stages lost / uncommitted
    for broken in ("triples", "mentions", "surfaces", "entities", "edges"):
        marker = os.path.join(root, broken, "_STAGE_COMMITTED")
        if os.path.exists(marker):
            os.remove(marker)

    # docs/sentences stay committed: resume must NOT recompute them.
    # Poison the upstream input to prove it: a recompute would change docs.
    empty_pages = pages.limit(0)
    store2 = StageStore(spark, root)
    resumed = run_pipeline(spark, empty_pages, store=store2)
    assert _triple_set(resumed) == golden
    assert resumed["docs"].count() == N_PAGES  # read from checkpoint


def test_lineage_rows_written(spark, pages, tmp_path):
    root = str(tmp_path / "stages")
    store = StageStore(spark, root)
    run_pipeline(spark, pages, store=store)

    lineage = store.lineage("triples")
    rows = lineage.collect()
    assert rows, "no lineage rows for triples stage"
    cols = set(lineage.columns)
    assert {"_pid", "row_count", "url_min", "url_max",
            "warc_ts_watermark", "stage", "model_version"} <= cols
    assert all(r["stage"] == "triples" for r in rows)
    assert all(r["model_version"] == "rule-extractor-v1" for r in rows)
    assert sum(r["row_count"] for r in rows) == store.read("triples").count()
    # docs lineage carries the warc_ts watermark
    docs_lineage = store.lineage("docs").collect()
    assert any(r["warc_ts_watermark"] is not None for r in docs_lineage)


def test_force_recompute(spark, pages, tmp_path):
    root = str(tmp_path / "stages")
    store = StageStore(spark, root)
    store.run("docs", lambda: pages.limit(10).select("url", "warc_ts", "lang"))
    assert store.read("docs").count() == 10
    # committed: same name returns cached result even with new compute fn
    df = store.run("docs", lambda: pages.select("url", "warc_ts", "lang"))
    assert df.count() == 10
    # force: recompute
    df = store.run(
        "docs", lambda: pages.select("url", "warc_ts", "lang"), force=True
    )
    assert df.count() == N_PAGES


def test_extractor_stages_do_not_cross_resume(spark, pages, tmp_path):
    """A stage root written with one extractor must not serve its
    triples/edges to the other (the extractor is part of the stage
    name); extractor-independent stages ARE shared."""
    import os

    from rex_spark.pipeline import run_pipeline

    root = str(tmp_path / "stages_x")
    r_fused = run_pipeline(spark, pages, store=StageStore(spark, root))
    n_fused = r_fused["triple_set"].count()
    assert os.path.exists(os.path.join(root, "triples", "_STAGE_COMMITTED"))

    r_cas = run_pipeline(
        spark, pages, store=StageStore(spark, root), extractor="casrel"
    )
    n_cas = r_cas["triple_set"].count()
    # casrel wrote its OWN stages alongside the fused ones
    assert os.path.exists(
        os.path.join(root, "triples_casrel", "_STAGE_COMMITTED")
    )
    assert os.path.exists(os.path.join(root, "edges_casrel", "_STAGE_COMMITTED"))
    key = ["url", "subj", "pred", "obj"]
    cas_set = {tuple(r) for r in r_cas["triple_set"].select(*key).collect()}
    from rex_spark.operators.pointer_extraction import casrel_extract
    from rex_spark.operators.textplane import clean_pages, segment_sentences

    want = {
        tuple(r)
        for r in casrel_extract(segment_sentences(clean_pages(pages)))
        .select(*key)
        .distinct()
        .collect()
    }
    assert cas_set == want
    assert n_fused > 0 and n_cas > 0
