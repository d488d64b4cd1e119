#!/usr/bin/env python
"""__TASK_NAME__ driver script.

    PYTHONPATH=. python run.py -c config.yaml [-a key=value ...]

Cluster: zip src/ and submit with --py-files (README).  Reruns resume
from the last committed stage under ``stage_root``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", action="append", default=[])
    p.add_argument("-a", "--set", dest="dotlist", action="append", default=[])
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from rex_spark.config import dump_config, load_config
    from rex_spark.io.stages import StageStore
    from rex_spark.pipeline import build_pages_df_distributed, run_pipeline
    from rex_spark.registry import import_submodules
    from rex_spark.session import get_session

    import_submodules("src")  # fire this task's @register decorators

    cfg = load_config(args.config, args.dotlist)
    spark = get_session(
        master=cfg.master,
        shuffle_partitions=cfg.shuffle_partitions,
        app_name="__TASK_NAME__",
    )
    if cfg.pages_table:
        pages = spark.read.parquet(cfg.pages_table)
    else:
        pages = build_pages_df_distributed(
            spark, cfg.synthetic_pages or 2000, seed=cfg.seed
        )
    store = StageStore(spark, cfg.stage_root) if cfg.stage_root else None
    if cfg.stage_root:
        dump_config(cfg, cfg.stage_root)
    t0 = time.perf_counter()
    result = run_pipeline(
        spark,
        pages,
        store=store,
        salt_partitions=cfg.salt_partitions,
        extractor=cfg.extractor,
        doc_filters=cfg.doc_filters(),
    )
    print(
        json.dumps(
            {
                "triples": result["triple_set"].count(),
                "entities": result["entities"].count(),
                "edges": result["edges"].count(),
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
