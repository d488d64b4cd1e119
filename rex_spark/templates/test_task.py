"""Pins the task's custom mechanism on a deterministic synthetic
corpus: run with ``PYTHONPATH=. python -m pytest test_task.py``."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from rex_spark.session import get_session

    s = get_session(master="local[4]", shuffle_partitions=4)
    yield s


def test_cooccur_extractor_end_to_end(spark, tmp_path):
    from rex_spark.pipeline import build_pages_df_distributed, run_pipeline

    from src import extractor  # noqa: F401 - registers "cooccur"

    pages = build_pages_df_distributed(spark, 200, seed=42)
    result = run_pipeline(spark, pages, extractor="cooccur")
    triples = result["triples"]
    assert triples.count() > 0
    row = triples.first()
    assert row["pred"] == "cooccurs_with"
    assert row["h_end"] == row["h_start"] + 1
    assert result["triple_set"].columns == ["url", "subj", "pred", "obj"]
