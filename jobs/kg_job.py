#!/usr/bin/env python
"""Production entry point for the KG-construction pipeline.

The Spark analog of REx's config-driven ``rex train -c conf.yaml``
lifecycle (SURVEY.md §3.1): one job script, all behavior from flags,
submitted as

    spark-submit --py-files rex_spark.zip jobs/kg_job.py \
        --pages-table /data/pages \
        --stage-root  /data/stages \
        --salt-partitions 64

or locally:

    PYTHONPATH=. python jobs/kg_job.py --synthetic 10000 --stage-root /tmp/kg

Reruns resume from the last committed stage (StageStore); pass
--no-store for a one-shot in-memory run (fused text plane).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-table", help="path of the pages table (parquet/Iceberg-style dir)")
    src.add_argument("--synthetic", type=int, metavar="N", help="synthesize N pages (seed fixed)")
    p.add_argument("--stage-root", help="checkpoint root; omit with --no-store")
    p.add_argument("--no-store", action="store_true", help="storeless fused run (no resume)")
    p.add_argument("--salt-partitions", type=int, default=8, help="J7 hub-key salting width")
    p.add_argument("--master", default=None, help="override spark master (default env/local)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--skip-sentence-text", action="store_true",
                   help="prune sentence text through the UDF (graph outputs only)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if not args.no_store and not args.stage_root:
        raise SystemExit("--stage-root is required unless --no-store")

    from rex_spark.io.stages import StageStore
    from rex_spark.pipeline import build_pages_df_distributed, run_pipeline
    from rex_spark.session import get_session

    spark = get_session(master=args.master, app_name="rex_spark_kg_job")
    if args.pages_table:
        pages = spark.read.parquet(args.pages_table)
    else:
        pages = build_pages_df_distributed(spark, args.synthetic, seed=args.seed)

    store = None if args.no_store else StageStore(spark, args.stage_root)
    t0 = time.perf_counter()
    result = run_pipeline(
        spark,
        pages,
        store=store,
        salt_partitions=args.salt_partitions,
        include_sentence_text=not args.skip_sentence_text,
    )
    summary = {
        "triples": result["triple_set"].count(),
        "entities": result["entities"].count(),
        "edges": result["edges"].count(),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "resumable": store is not None,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
