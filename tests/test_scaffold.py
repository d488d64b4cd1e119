"""`python -m rex_spark new` scaffold (reference parity:
rex/cmds/new.py:13-24 + rex/templates/*): the generated project must be
complete, name-rendered, and its custom extractor must actually run
through the pipeline's M1 slot."""

import subprocess
import sys

import pytest

from rex_spark.scaffold import new_task


def test_new_task_renders_complete_project(tmp_path):
    task_dir = new_task("acme_re", parent=tmp_path)
    names = {p.relative_to(task_dir).as_posix() for p in task_dir.rglob("*") if p.is_file()}
    assert {
        "README.md",
        "config.yaml",
        "run.py",
        "test_task.py",
        "src/__init__.py",
        "src/extractor.py",
    } <= names
    # name token rendered everywhere
    for p in task_dir.rglob("*"):
        if p.is_file():
            assert "__TASK_NAME__" not in p.read_text()
    assert "acme_re" in (task_dir / "README.md").read_text()
    # refuses to overwrite, like the reference's copytree
    with pytest.raises(FileExistsError):
        new_task("acme_re", parent=tmp_path)


def test_cli_entry(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "rex_spark", "new", "cli_task"],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        env={"PYTHONPATH": str(__import__("pathlib").Path(__file__).resolve().parents[1]), "PATH": "/usr/bin:/bin"},
    )
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "cli_task" / "config.yaml").exists()


def test_scaffolded_extractor_runs_in_m1_slot(spark, tmp_path):
    """Import the generated src package and run the pipeline with the
    scaffold's registered mechanism — the full user journey."""
    task_dir = new_task("journey", parent=tmp_path)
    sys.path.insert(0, str(task_dir))
    try:
        from src import extractor  # noqa: F401 - fires @register("cooccur")

        from rex_spark.pipeline import build_pages_df_distributed, run_pipeline

        pages = build_pages_df_distributed(spark, 120, seed=42)
        result = run_pipeline(spark, pages, extractor="cooccur")
        triples = result["triples"]
        assert triples.count() > 0
        row = triples.orderBy("url", "sent_id", "h_start").first()
        assert row["pred"] == "cooccurs_with"
        assert row["h_end"] == row["h_start"] + 1
        assert row["t_start"] > row["h_start"]
    finally:
        sys.path.remove(str(task_dir))
        for mod in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
            del sys.modules[mod]
