"""Stage checkpoints with per-partition lineage + match-count metrics.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
The reference's analogue is CSV handoffs in /dev/shm plus skip-if-exists
(`Main.py:42-50`, `Full_State_Sample_Generation.py:53-58`) and row-count
guards (`Classify_Unknowns_opt.py:674-690`).

Backend: on a production cluster each stage would be
``df.writeTo("catalog.db.ckpt_stageN").using("iceberg").createOrReplace()``
with snapshot metadata as the resume marker. No Iceberg runtime jar ships in
this sandbox, so the store is parquet + an explicit ``_manifest.json`` commit
marker with identical semantics (atomic via write-then-rename, stage rerun is
skip-if-committed). The API is backend-neutral: swap `_write`/`_read` for the
Iceberg calls and nothing above changes.

Per-partition lineage metrics are collected with
``groupBy(spark_partition_id())`` — one row per physical partition per stage:
rows_out, plus stage-specific counters (pairs_scored, matches) merged in by
the pipeline.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, root: str, job_id: str):
        self.root = os.path.join(root, job_id)
        os.makedirs(self.root, exist_ok=True)

    def _table_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._manifest.json")

    def exists(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def write(
        self,
        stage: str,
        df: DataFrame,
        extra_metrics: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Materialize a stage table + its lineage metrics; returns metrics.

        Idempotent: if the stage manifest exists the write is skipped and the
        recorded metrics are returned (resume semantics).
        """
        if self.exists(stage):
            return self.read_metrics(stage)

        t0 = time.time()
        path = self._table_path(stage)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        spark = df.sparkSession
        written = spark.read.parquet(path)
        per_partition = (
            written.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .orderBy("partition_id")
            .collect()
        )
        metrics = {
            "stage": stage,
            "rows_out": int(sum(r["rows_out"] for r in per_partition)),
            "n_partitions": len(per_partition),
            "partitions": [
                {"partition_id": int(r["partition_id"]), "rows_out": int(r["rows_out"])}
                for r in per_partition
            ],
            "wall_s": round(time.time() - t0, 3),
        }
        if extra_metrics:
            metrics.update(extra_metrics)

        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(metrics, f, indent=1)
        os.replace(tmp, self._manifest_path(stage))  # atomic commit marker
        return metrics

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        if not self.exists(stage):
            raise FileNotFoundError(f"checkpoint stage '{stage}' not committed")
        return spark.read.parquet(self._table_path(stage))

    def read_metrics(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def invalidate(self, stage: str) -> None:
        m = self._manifest_path(stage)
        if os.path.exists(m):
            os.remove(m)
