"""Project scaffold — ``python -m rex_spark new <task_dir>`` (the
reference's ``rex new`` command, rex/cmds/new.py:13-24, which copytrees
rex/templates/ into a task folder).

Re-expression, not a port: the reference's templates are a PyTorch
task skeleton (model.py / task.py / transform.py + trainer yaml); this
engine's skeleton is a PIPELINE project — a custom extraction
mechanism registered into the M1 slot, a PipelineConfig yaml, a
spark-submit-able run script, and a pytest that pins the custom
mechanism on synthetic pages.  Like the reference, scaffolding is a
plain file copy (no template engine); the only rendering is the task
name in README/config, so a generated project is immediately
runnable and diffable against the template.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

TEMPLATES_DIR = Path(__file__).parent / "templates"
_NAME_TOKEN = "__TASK_NAME__"


def new_task(task_name: str, parent: str | Path = ".") -> Path:
    """Copy the template tree to ``parent/task_name`` and substitute
    the task name in text files.  Refuses to overwrite (the reference's
    copytree raises on an existing dir too)."""
    task_dir = Path(parent) / task_name
    if task_dir.exists():
        raise FileExistsError(f"{task_dir} already exists")
    shutil.copytree(TEMPLATES_DIR, task_dir)
    for p in task_dir.rglob("*"):
        if p.is_file():
            try:
                text = p.read_text()
            except UnicodeDecodeError:  # pragma: no cover - no binaries today
                continue
            if _NAME_TOKEN in text:
                p.write_text(text.replace(_NAME_TOKEN, task_name))
    return task_dir


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m rex_spark",
        description="rex_spark command line (reference parity: rex/main.py)",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_new = sub.add_parser(
        "new", help="scaffold a new pipeline task directory from templates"
    )
    p_new.add_argument("task_name", help="name of the task directory to create")
    args = parser.parse_args(argv)
    if args.cmd == "new":
        task_dir = new_task(args.task_name)
        print(f"New task in {task_dir.absolute()}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
