"""StageStore: resumable stage checkpoints with per-partition lineage.

Re-expresses REx's dataset-level pickle cache
(rex/data/data_manager.py:143-181: compute-or-load keyed on file
existence, with a regenerate flag) as table-level checkpoints, plus the
north-star lineage requirement: every committed stage appends one
lineage row PER OUTPUT PARTITION recording url range, warc_ts
watermark, row count, and model version.

Format: parquet directories with an atomic ``_STAGE_COMMITTED`` marker
(written only after both data and lineage land).  On Iceberg
deployments the same interface maps to ``writeTo(tbl).using("iceberg")``
snapshots + a lineage table; the sandbox has no Iceberg jars, so the
parquet layout stands in while keeping the exact resume semantics:
a stage interrupted mid-write leaves no marker and is recomputed; a
committed stage is never recomputed unless ``force``.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.kb import MODEL_VERSION

_MARKER = "_STAGE_COMMITTED"


@dataclass
class StageStore:
    spark: SparkSession
    root: str

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _lineage_dir(self, name: str) -> str:
        return os.path.join(self.root, "_lineage", name)

    def is_committed(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), _MARKER))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(name))

    def lineage(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._lineage_dir(name))

    def _metrics_dir(self, name: str) -> str:
        return os.path.join(self.root, "_metrics", name)

    def write_metrics(self, name: str, values: dict) -> None:
        """Land per-stage scalar metrics (e.g. Observation results:
        dropped sentence/pair/mention counts) next to the lineage rows
        — the P9 drop-count contract (rex/data/transforms/sent_re.py:
        44-58 logs exactly these per transform)."""
        rows = [
            (name, k, int(v) if v is not None else 0, MODEL_VERSION)
            for k, v in sorted(values.items())
        ]
        self.spark.createDataFrame(
            rows, "stage string, metric string, value long, model_version string"
        ).coalesce(1).write.mode("overwrite").parquet(self._metrics_dir(name))

    def metrics(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._metrics_dir(name))

    def run(
        self,
        name: str,
        compute: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """compute-or-load: the resume seam.

        Committed stage -> read back (lazy, no recompute).  Otherwise:
        compute, write data, derive + write per-partition lineage,
        then commit the marker (atomic rename-free protocol: marker is
        the last write, so a crash anywhere earlier leaves an
        uncommitted, recomputable stage).
        """
        path = self._dir(name)
        if self.is_committed(name) and not force:
            return self.read(name)
        if os.path.exists(path):
            shutil.rmtree(path)

        df = compute()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        written = self.spark.read.parquet(path)
        self._write_lineage(name, written)
        with open(os.path.join(path, _MARKER), "w", encoding="utf-8") as fh:
            json.dump({"stage": name, "model_version": MODEL_VERSION}, fh)
        return self.read(name)

    def _write_lineage(self, name: str, df: DataFrame) -> None:
        """One row per physical partition: url range, warc_ts watermark,
        row count, model version (north-star lineage contract).
        Columns the stage lacks are recorded as nulls."""
        cols = set(df.columns)
        url_col = F.col("url") if "url" in cols else F.lit(None).cast("string")
        ts_col = (
            F.col("warc_ts") if "warc_ts" in cols else F.lit(None).cast("timestamp")
        )
        lineage = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                F.count(F.lit(1)).alias("row_count"),
                F.min(url_col).alias("url_min"),
                F.max(url_col).alias("url_max"),
                F.max(ts_col).alias("warc_ts_watermark"),
            )
            .withColumn("stage", F.lit(name))
            .withColumn("model_version", F.lit(MODEL_VERSION))
        )
        lineage.write.mode("overwrite").parquet(self._lineage_dir(name))
