#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of the headline queries (per-query
median of ``$SPARK_GRAFT_BENCH_RUNS`` timed runs, default 3 — this VM
throws occasional multi-x outliers, see BASELINE.md methodology; the
per-run detail is reported under ``query_runs``); extra keys report
the north-rule throughput (triples/sec of the KG pipeline).

``--scale`` mode: runs the SAME KG-construction job on the SAME input at
two parallelism levels (``$SPARK_GRAFT_SCALE_CORES``, default 4 vs 16 —
the sandbox stand-in for N vs 4N executors; see the SCALE_CORES comment
for why not 8 vs 32) and prints throughput at both plus scaling
efficiency = (t_N / t_4N) / 4.  Results are also appended to BASELINE.md
by ``--scale --update-baseline``.

Noise immunity (VERDICT r4 #1): the headline JSON carries BOTH
``median_of_N`` (primary) and ``min_of_runs`` totals — this VM's
ambient load only ever ADDS time, so per-query minimums are the noise
floor — plus an ``ab`` block: an ABAB-interleaved comparison of HEAD
vs the previous round's code (fresh subprocess + SparkSession per
run, alternated in time so slow ambient drift hits both sides
equally).  ``python bench.py --ab <git-ref>`` runs just the AB
comparison; the default mode runs it against ``$SPARK_GRAFT_AB_REF``
(default: the round-4 bench commit) after the headline queries.
Round-over-round comparisons should read ``ab.min_ratio`` /
``ab.median_ratio``, not raw totals from different sessions.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect of big results).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages synthesized for the KG-pipeline benchmark (deterministic, seed=42)
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "100000"))
# the scaling run needs a compute-dominated input: small corpora measure
# scheduler overhead, not scaling (56 core-seconds of work cannot show
# a 4x speedup on a job with ~5s of fixed per-run cost)
SCALE_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "3200000"))
# N and 4N parallelism levels for the scaling evidence.  Default 4->16:
# a measured pure-Python multiprocessing control shows this sandbox VM
# itself scales 8->32 workers at only ~0.88 efficiency (memory
# bandwidth), so the 4->16 pair demonstrates the JOB's scaling in a
# regime where the hardware can still supply it; the full 2..32 sweep
# is reported alongside in BASELINE.md.
SCALE_CORES = tuple(
    int(c) for c in os.environ.get("SPARK_GRAFT_SCALE_CORES", "4,16").split(",")
)
# timed repetitions per parallelism level (median reported): the VM's
# ambient noise produces occasional 1.5-2x outliers, so more reps give
# a stabler median at the cost of wall time
SCALE_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))

# headline subset of __spark_entry__.queries(): the KG flagship plus one
# representative per operator family (agg / join / pairgen / window /
# dedup-exact / dedup-minhash / ANN / text-stats).
HEADLINE = [
    "agg_pricing",
    "join_lookup",
    "pairgen",
    "window_dedup",
    "exact_dedup",
    "minhash_lsh",
    "cosine_topk",
    "doc_stats",
    "token_counts",
]


def _force(df) -> int:
    """Force full computation; return row count (noop write + count)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def _run_kg(spark, n_pages: int) -> tuple[float, int]:
    """Run the full KG pipeline on a fresh synthetic corpus; returns
    (seconds, n_triples).  Synthesis is distributed (executor-side) and
    cached outside the timed region."""
    from rex_spark.pipeline import build_pages_df_distributed, run_pipeline

    # fresh measurement: Spark's cache manager matches plans across
    # DataFrame objects, so without this a repeat run of the identical
    # pipeline silently serves every stage from the previous run's
    # persisted data
    spark.catalog.clearCache()
    # 2x cores: enough task waves to overlap the JVM Arrow feed with
    # Python UDF compute and to smooth stragglers
    parts = 2 * spark.sparkContext.defaultParallelism
    pages = build_pages_df_distributed(spark, n_pages, seed=42, partitions=parts).cache()
    pages.count()  # materialize input outside the timed region
    t0 = time.perf_counter()
    # sentence text is not an output of the benchmarked job (only
    # triples/entities/edges are forced) -> prune it through the UDF
    result = run_pipeline(
        spark, pages, store=None, salt_partitions=8, include_sentence_text=False
    )
    n_triples = result["triple_set"].count()
    _force(result["entities"])
    _force(result["edges"])
    elapsed = time.perf_counter() - t0
    pages.unpersist()
    return elapsed, n_triples


# timed repetitions per headline query (median reported): this VM has
# occasional 2-5x outlier runs even unloaded (BASELINE.md methodology);
# a single cold sample of the dominant query is a lottery ticket, the
# per-query median is reproducible.
BENCH_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def bench_once() -> dict:
    import statistics

    from rex_spark.session import get_session

    import __spark_entry__ as entry_mod

    spark = get_session(master=f"local[{CPUS}]", app_name="rex_spark_bench")
    qmap = entry_mod.bench_queries()
    timings: dict[str, float] = {}
    detail: dict[str, list[float]] = {}

    # warm the JVM / Arrow path / Python workers, then one untimed
    # full-size dry run: C2 JIT on the real 100k-page shapes takes ~2
    # iterations to settle (first-run wall is ~1.5x steady state), and
    # the BASELINE targets are steady-state throughput.
    spark.range(1000).selectExpr("sum(id)").collect()
    _run_kg(spark, max(500, N_PAGES // 20))
    _run_kg(spark, N_PAGES)

    kg_times, n_triples = [], 0
    for _ in range(BENCH_RUNS):
        sec, n_triples = _run_kg(spark, N_PAGES)
        kg_times.append(sec)
    kg_sec = statistics.median(kg_times)
    timings["kg_pipeline"] = round(kg_sec, 3)
    detail["kg_pipeline"] = [round(t, 3) for t in kg_times]

    for name in HEADLINE:
        fn = qmap[name]
        runs = []
        for _ in range(BENCH_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        detail[name] = [round(t, 3) for t in runs]

    # noise floor: ambient load on this shared VM only ever ADDS time,
    # so the per-query minimum approximates the uncontended run
    timings_min = {name: min(runs) for name, runs in detail.items()}
    total = round(sum(timings.values()), 3)
    kg_min = timings_min["kg_pipeline"]
    sf = 0.1
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass
    return {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "agg": f"median_of_{BENCH_RUNS}",
        "value_min_of_runs": round(sum(timings_min.values()), 3),
        "queries_min": {n: round(t, 3) for n, t in timings_min.items()},
        "query_runs": detail,
        "sf": sf,
        "kg_pages": N_PAGES,
        "kg_triples": n_triples,
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec else None,
        "pages_per_sec": round(N_PAGES / kg_sec, 1) if kg_sec else None,
        "triples_per_sec_min_run": (
            round(n_triples / kg_min, 1) if kg_min else None
        ),
        "cpus": CPUS,
    }


# ---------------------------------------------------------------------------
# ABAB-interleaved HEAD-vs-ref comparison (VERDICT r4 #1)
# ---------------------------------------------------------------------------

# ref the default AB comparison measures against: the round-4 bench
# commit (the code BENCH_r04.json was recorded from), so the recorded
# round-over-round signal is load-robust even if the two rounds' bench
# sessions saw different ambient host load.
AB_DEFAULT_REF = os.environ.get("SPARK_GRAFT_AB_REF", "24bcf4c")
AB_ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
AB_RUNS_PER = int(os.environ.get("SPARK_GRAFT_AB_RUNS_PER", "2"))

# Self-contained runner executed in a fresh subprocess per AB leg: puts
# the requested repo checkout FIRST on sys.path/PYTHONPATH (so both the
# driver plan and the pickled-by-reference UDF kernels resolve to THAT
# version — a shared session would mix old driver code with new worker
# code), warms the JVM exactly like bench_once, then prints timed runs.
# Uses only pipeline APIs stable since round 2.
_AB_RUNNER = r"""
import json, sys, time
repo, n_pages, runs, cpus = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
)
sys.path.insert(0, repo)
from rex_spark.session import get_session
from rex_spark.pipeline import build_pages_df_distributed, run_pipeline

spark = get_session(master=f"local[{cpus}]", app_name="rex_spark_ab")
spark.range(1000).selectExpr("sum(id)").collect()

def run_once(n):
    spark.catalog.clearCache()
    parts = 2 * spark.sparkContext.defaultParallelism
    pages = build_pages_df_distributed(
        spark, n, seed=42, partitions=parts
    ).cache()
    pages.count()
    t0 = time.perf_counter()
    result = run_pipeline(
        spark, pages, store=None, salt_partitions=8,
        include_sentence_text=False,
    )
    result["triple_set"].count()
    result["entities"].write.format("noop").mode("overwrite").save()
    result["edges"].write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    pages.unpersist()
    return elapsed

run_once(max(500, n_pages // 20))   # JVM/Arrow/py-worker warm-up
run_once(n_pages)                   # untimed full-size run (C2 JIT)
times = [run_once(n_pages) for _ in range(runs)]
print("ABRESULT " + json.dumps(times))
"""


def bench_ab(
    ref: str,
    n_pages: int | None = None,
    rounds: int | None = None,
    runs_per: int | None = None,
) -> dict:
    """ABAB-interleaved KG-pipeline comparison of HEAD vs ``ref``.

    Each leg is a fresh subprocess (own SparkSession, own PYTHONPATH
    pointing at either this repo or a detached worktree of ``ref``),
    and legs alternate HEAD, ref, HEAD, ref ... in time — ambient host
    load drifts on the scale of minutes, so interleaving exposes both
    sides to the same conditions, and pooled MINIMUMS (load only adds
    time) give the load-robust code-vs-code signal that single-session
    medians recorded hours apart cannot (BENCH_r03 vs _r04's phantom
    1.45x).  Returns medians, pooled minimums and their ratios
    (ratio < 1 means HEAD is faster).
    """
    import statistics
    import subprocess
    import tempfile

    n_pages = N_PAGES if n_pages is None else n_pages
    rounds = AB_ROUNDS if rounds is None else rounds
    runs_per = AB_RUNS_PER if runs_per is None else runs_per
    repo = os.path.dirname(os.path.abspath(__file__))

    sha = subprocess.run(
        ["git", "-C", repo, "rev-parse", "--short", ref],
        capture_output=True, text=True,
    )
    if sha.returncode != 0:
        return {"ref": ref, "error": f"unresolvable ref: {sha.stderr.strip()}"}
    sha = sha.stdout.strip()

    def run_leg(leg_repo: str) -> list[float]:
        with tempfile.NamedTemporaryFile(
            "w", suffix="_ab_runner.py", delete=False
        ) as f:
            f.write(_AB_RUNNER)
            runner = f.name
        env = dict(os.environ)
        env["PYTHONPATH"] = leg_repo  # worker imports resolve to this leg
        try:
            proc = subprocess.run(
                [sys.executable, runner, leg_repo, str(n_pages),
                 str(runs_per), str(CPUS)],
                capture_output=True, text=True, env=env, timeout=1800,
            )
        finally:
            os.unlink(runner)
        for line in (proc.stdout or "").replace("\r", "\n").splitlines():
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise RuntimeError(
            f"AB leg produced no result (rc={proc.returncode}): "
            + (proc.stderr or "")[-2000:]
        )

    wt = tempfile.mkdtemp(prefix=f"rex_ab_{sha}_")
    os.rmdir(wt)  # git worktree add wants to create it
    add = subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", wt, sha],
        capture_output=True, text=True,
    )
    if add.returncode != 0:
        return {"ref": sha, "error": f"worktree add failed: {add.stderr.strip()}"}
    try:
        head_times: list[float] = []
        ref_times: list[float] = []
        for _ in range(rounds):
            head_times += run_leg(repo)
            ref_times += run_leg(wt)
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            capture_output=True, text=True,
        )
    h_med, r_med = statistics.median(head_times), statistics.median(ref_times)
    h_min, r_min = min(head_times), min(ref_times)
    return {
        "metric": "kg_pipeline_ab_head_vs_ref",
        "ref": sha,
        "pattern": "AB" * rounds,
        "n_pages": n_pages,
        "runs_per_leg": runs_per,
        "head_runs_sec": [round(t, 3) for t in head_times],
        "ref_runs_sec": [round(t, 3) for t in ref_times],
        "head_median": round(h_med, 3),
        "ref_median": round(r_med, 3),
        "head_min": round(h_min, 3),
        "ref_min": round(r_min, 3),
        "median_ratio": round(h_med / r_med, 3),
        "min_ratio": round(h_min / r_min, 3),
    }


def bench_scale(n_pages: int, update_baseline: bool = False) -> dict:
    """Same job, same input, at the SPARK_GRAFT_SCALE_CORES pair
    (default local[4] vs local[16] — N vs 4N).

    Median of SCALE_RUNS timed runs per parallelism level: the VM's GC
    and scheduling noise produce occasional 2x outliers that would
    otherwise dominate a single-shot measurement.
    """
    import statistics

    from rex_spark.session import get_session, stop_session

    lo, hi = SCALE_CORES
    runs = {}
    for cores in (lo, hi):
        stop_session()
        spark = get_session(
            master=f"local[{cores}]",
            shuffle_partitions=cores,
            app_name=f"rex_spark_scale_{cores}",
        )
        spark.range(1000).selectExpr("sum(id)").collect()  # warm-up
        _run_kg(spark, max(200, n_pages // 10))  # warm run (JVM/codegen)
        times, n_triples = [], 0
        for _ in range(SCALE_RUNS):
            sec, n_triples = _run_kg(spark, n_pages)
            times.append(sec)
        sec = statistics.median(times)
        runs[cores] = {
            "cores": cores,
            "sec": round(sec, 3),
            "all_runs_sec": [round(t, 3) for t in times],
            "triples": n_triples,
            "triples_per_sec": round(n_triples / sec, 1),
        }
        spark.stop()
    eff = (runs[lo]["sec"] / runs[hi]["sec"]) / (hi / lo)
    # noise-floor estimate: this shared VM's ambient load only ever ADDS
    # time, so the per-level minimum approximates the uncontended run
    # and best/best is the least-contaminated efficiency estimate
    # (median remains the primary, honest-about-noise number).
    eff_best = (
        min(runs[lo]["all_runs_sec"]) / min(runs[hi]["all_runs_sec"])
    ) / (hi / lo)
    out = {
        "metric": f"kg_scaling_efficiency_{lo}_to_{hi}",
        "value": round(eff, 3),
        "value_best_runs": round(eff_best, 3),
        "unit": "ratio",
        "n_pages": n_pages,
        "runs": runs,
        "target": 0.8,
    }
    if update_baseline:
        _append_baseline(out)
    return out


def _append_baseline(out: dict) -> None:
    lo, hi = SCALE_CORES
    lines = [
        "## Measured scaling (bench.py --scale)",
        "",
        f"Same KG-construction job, same {out['n_pages']}-page synthetic input,",
        "run at two parallelism levels (sandbox stand-in for N vs 4N executors),",
        f"median of {SCALE_RUNS} timed runs after a warm run, caches cleared between runs:",
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
        f"(target ≥ {out['target']}; efficiency = (t_{lo} / t_{hi}) / {hi // lo}; "
        f"medians).  Best-runs (noise floor, ambient load only adds time): "
        f"**{out.get('value_best_runs', out['value'])}**.",
        "",
    ]
    from tools.section_util import replace_section

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    replace_section(
        path, "## Measured scaling (bench.py --scale)", "\n".join(lines) + "\n"
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scale" in sys.argv:
        out = bench_scale(
            SCALE_PAGES, update_baseline="--update-baseline" in sys.argv
        )
    elif "--ab" in sys.argv:
        ref = sys.argv[sys.argv.index("--ab") + 1]
        out = bench_ab(ref)
    else:
        out = bench_once()
        # round-over-round signal: interleaved HEAD-vs-previous-round AB
        # (load-robust, unlike raw totals from different sessions).
        # Opt out with SPARK_GRAFT_AB=0; a failure must not sink the
        # whole bench artifact.
        if os.environ.get("SPARK_GRAFT_AB", "1") != "0":
            from rex_spark.session import stop_session

            stop_session()  # one JVM at a time: AB legs get the machine
            try:
                out["ab"] = bench_ab(AB_DEFAULT_REF)
            except Exception as exc:  # noqa: BLE001
                out["ab"] = {"ref": AB_DEFAULT_REF, "error": str(exc)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
