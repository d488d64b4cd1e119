#!/usr/bin/env python
"""Scaling evidence through the LITERAL ``spark-submit --py-files``
surface (BASELINE.json north rule: "run via spark-submit --py-files
... at two cluster sizes (N and 4N executors) with throughput scaling
efficiency >=0.8").

``bench.py --scale`` measures the same job with in-process sessions;
this tool removes the remaining gap by shipping ``rex_spark`` as a zip
to a real ``spark-submit`` invocation per parallelism level — the
exact deployment shape of a cluster run.  Methodology is identical to
``bench_scale`` (one warm run for JVM/C2 + Arrow codegen, then median
of K timed pipeline runs, cache cleared between runs); the only
difference is the process boundary.

Driver mode (builds the zip, shells out, computes efficiency):

    PYTHONPATH=. python tools/submit_scale.py --pages 3200000 \
        --runs 5 [--update-baseline]

Worker mode (what the driver submits; needs only the zip on py-files):

    spark-submit --master local[4] --driver-memory 24g \
        --py-files /tmp/rex_spark.zip tools/submit_scale.py \
        --worker --cores 4 --pages 3200000 --runs 5
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# worker: runs INSIDE spark-submit, imports only the shipped package
# ---------------------------------------------------------------------------

def _run_kg_once(spark, n_pages: int) -> tuple[float, int]:
    """One full pipeline run, synthesis cached outside the timed region
    (mirrors bench.py _run_kg; kept self-contained because bench.py is
    not shipped in the py-files zip)."""
    from rex_spark.pipeline import build_pages_df_distributed, run_pipeline

    spark.catalog.clearCache()
    parts = 2 * spark.sparkContext.defaultParallelism
    pages = build_pages_df_distributed(
        spark, n_pages, seed=42, partitions=parts
    ).cache()
    pages.count()
    t0 = time.perf_counter()
    result = run_pipeline(
        spark, pages, store=None, salt_partitions=8,
        include_sentence_text=False,
    )
    n_triples = result["triple_set"].count()
    for key in ("entities", "edges"):
        result[key].write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    pages.unpersist()
    return elapsed, n_triples


def worker(cores: int, n_pages: int, runs: int) -> None:
    from rex_spark.session import get_session

    spark = get_session(
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        app_name=f"rex_spark_submit_scale_{cores}",
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    _run_kg_once(spark, max(200, n_pages // 10))  # warm (JVM/C2/Arrow)
    times, n_triples = [], 0
    for _ in range(runs):
        sec, n_triples = _run_kg_once(spark, n_pages)
        times.append(round(sec, 3))
    sec = statistics.median(times)
    print(json.dumps({
        "cores": cores,
        "sec": round(sec, 3),
        "all_runs_sec": times,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / sec, 1),
    }))
    spark.stop()


# ---------------------------------------------------------------------------
# driver: packages the zip, submits per level, computes efficiency
# ---------------------------------------------------------------------------

def build_zip(path: str) -> str:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "rex_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith((".py", ".md", ".txt", ".yaml")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def submit_level(zip_path: str, cores: int, n_pages: int, runs: int) -> dict:
    spark_submit = os.environ.get("SPARK_SUBMIT", "spark-submit")
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        # client mode: driver memory must be fixed BEFORE the JVM
        # launches; the in-session default from rex_spark.session is
        # ignored by an already-running spark-submit JVM
        "--driver-memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "--py-files", zip_path,
        os.path.abspath(__file__),
        "--worker", "--cores", str(cores),
        "--pages", str(n_pages), "--runs", str(runs),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd="/tmp",
        env={**os.environ, "PYTHONPATH": ""},  # ONLY the zip provides rex_spark
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"spark-submit local[{cores}] failed")
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line from local[{cores}] run")


def driver(n_pages: int, runs: int, lo: int, hi: int,
           update_baseline: bool) -> dict:
    zip_path = build_zip("/tmp/rex_spark_submit.zip")
    results = {}
    for cores in (lo, hi):
        results[cores] = submit_level(zip_path, cores, n_pages, runs)
        print(f"# local[{cores}]: {results[cores]}", file=sys.stderr)
    assert results[lo]["triples"] == results[hi]["triples"], "outputs differ"
    eff = (results[lo]["sec"] / results[hi]["sec"]) / (hi / lo)
    eff_best = (
        min(results[lo]["all_runs_sec"]) / min(results[hi]["all_runs_sec"])
    ) / (hi / lo)
    out = {
        "metric": f"kg_scaling_efficiency_spark_submit_{lo}_to_{hi}",
        "value": round(eff, 3),
        "value_best_runs": round(eff_best, 3),
        "unit": "ratio",
        "n_pages": n_pages,
        "runs": results,
        "target": 0.8,
        "surface": "spark-submit --py-files rex_spark.zip (fresh JVM per level)",
    }
    if update_baseline:
        _append_baseline(out, lo, hi)
    return out


def _append_baseline(out: dict, lo: int, hi: int) -> None:
    sys.path.insert(0, REPO)
    from tools.section_util import replace_section

    lines = [
        "## Measured scaling (spark-submit --py-files)",
        "",
        "The same measurement as the section above, but through the",
        "LITERAL deployment surface the north rule names: `rex_spark`",
        "zipped and shipped to a fresh `spark-submit --py-files` JVM per",
        f"parallelism level (nothing from the repo on PYTHONPATH), same",
        f"{out['n_pages']}-page synthetic input, warm run + median of",
        f"{len(out['runs'][lo]['all_runs_sec'])} timed runs, caches cleared between runs:",
        "",
        "| cores | wall (s) | all runs (s) | triples | triples/sec |",
        "|---|---|---|---|---|",
    ]
    for c in (lo, hi):
        r = out["runs"][c]
        lines.append(
            f"| local[{c}] | {r['sec']} | {r['all_runs_sec']} |"
            f" {r['triples']} | {r['triples_per_sec']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency {lo}→{hi} cores: {out['value']}** "
        f"(target ≥ 0.8; efficiency = (t_{lo} / t_{hi}) / {hi // lo}; medians).  "
        f"Best-runs (noise floor): **{out['value_best_runs']}**.  Identical "
        "triple counts at both levels.",
        "",
    ]
    replace_section(
        os.path.join(REPO, "BASELINE.md"),
        "## Measured scaling (spark-submit --py-files)",
        "\n".join(lines) + "\n",
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--worker", action="store_true")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--pages", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_SCALE_PAGES",
                                              "3200000")))
    p.add_argument("--runs", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "5")))
    p.add_argument("--lo", type=int, default=4)
    p.add_argument("--hi", type=int, default=16)
    p.add_argument("--update-baseline", action="store_true")
    args = p.parse_args()
    if args.worker:
        if args.cores is None:
            p.error("--worker requires --cores N")
        worker(args.cores, args.pages, args.runs)
        return
    out = driver(args.pages, args.runs, args.lo, args.hi,
                 args.update_baseline)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
