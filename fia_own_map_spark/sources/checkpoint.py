"""Stage checkpoints with snapshot history, per-partition lineage and
match-count metrics.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
The reference's analogue is CSV handoffs in /dev/shm plus skip-if-exists
(`Main.py:42-50`, `Full_State_Sample_Generation.py:53-58`) and row-count
guards (`Classify_Unknowns_opt.py:674-690`).

Backend: on a production cluster each stage would be
``df.writeTo("catalog.db.ckpt_stageN").using("iceberg").createOrReplace()``.
No Iceberg runtime jar ships in this sandbox, so the store reproduces the
Iceberg snapshot model on parquet:

  * every commit writes a NEW immutable snapshot dir (``stage/snap-N``) —
    never in place;
  * a ``_manifest.json`` (written atomically via rename) is the commit
    pointer: ``current`` snapshot id + the full snapshot history, each entry
    carrying its lineage metrics;
  * ``read(..., snapshot_id=)`` is time travel, ``rollback`` moves the
    pointer, ``expire_snapshots`` is snapshot expiry/GC.

Stage rerun is skip-if-committed; ``invalidate`` clears the pointer but
keeps history, so a recompute commits the next snapshot id and the previous
state remains rollback-able. The API is backend-neutral: swap the parquet
read/write for Iceberg calls and nothing above changes.

Per-partition lineage metrics come from the parquet footers of the
snapshot's data files (one file per write task) — metadata-only, the way
Iceberg manifests carry per-file stats: rows_out + n_bytes per partition,
plus stage-specific counters (pairs_scored, matches) merged in by the
pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, root: str, job_id: str):
        self.root = os.path.join(root, job_id)
        os.makedirs(self.root, exist_ok=True)

    def _table_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _snap_path(self, stage: str, snap_id: int) -> str:
        return os.path.join(self._table_path(stage), f"snap-{snap_id}")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._manifest.json")

    def _manifest(self, stage: str) -> dict:
        try:
            with open(self._manifest_path(stage)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"current": None, "snapshots": []}

    def _commit(self, stage: str, manifest: dict) -> None:
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(stage))  # atomic pointer flip

    # -- public API ---------------------------------------------------------
    def exists(self, stage: str) -> bool:
        return self._manifest(stage)["current"] is not None

    def history(self, stage: str) -> list[dict]:
        """All snapshots ever committed for the stage (Iceberg history)."""
        return self._manifest(stage)["snapshots"]

    def write(
        self,
        stage: str,
        df: DataFrame,
        extra_metrics: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Commit a new snapshot of the stage + lineage metrics; returns
        the snapshot's metrics.

        Idempotent: if the stage has a current snapshot the write is skipped
        and its recorded metrics are returned (resume semantics).
        """
        if self.exists(stage):
            return self.read_metrics(stage)

        t0 = time.time()
        manifest = self._manifest(stage)
        snap_id = max((s["snapshot_id"] for s in manifest["snapshots"]), default=-1) + 1
        path = self._snap_path(stage, snap_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        # per-partition lineage from the parquet FOOTERS (one output file
        # per write task): metadata-only, no second scan job — the same way
        # Iceberg commits carry per-file stats in the manifest. The previous
        # implementation re-read the snapshot and ran a
        # groupBy(spark_partition_id()) job per stage; at 4 stages that was
        # a measurable fixed cost of every ER run and grew with core count.
        per_partition = self._file_stats(path)
        metrics = {
            "stage": stage,
            "snapshot_id": snap_id,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "rows_out": int(sum(r["rows_out"] for r in per_partition)),
            "n_partitions": len(per_partition),
            "partitions": per_partition,
            "wall_s": round(time.time() - t0, 3),
        }
        if extra_metrics:
            metrics.update(extra_metrics)

        manifest["snapshots"].append(metrics)
        manifest["current"] = snap_id
        self._commit(stage, manifest)
        return metrics

    @staticmethod
    def _file_stats(path: str) -> list[dict]:
        """(partition_id, rows_out, n_bytes) per data file, from parquet
        footers — driver-side metadata read, no Spark job. Recurses into
        hive-partitioned subdirectories (partition_by writes)."""
        import pyarrow.parquet as pq

        files: list[str] = []
        for dirpath, _dirs, names in os.walk(path):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    files.append(os.path.join(dirpath, n))
        files.sort()
        out = []
        for i, f in enumerate(files):
            out.append(
                {
                    "partition_id": i,
                    "rows_out": int(pq.ParquetFile(f).metadata.num_rows),
                    "n_bytes": os.path.getsize(f),
                }
            )
        return out

    def read(
        self, spark: SparkSession, stage: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """Read the current snapshot, or a historical one (time travel)."""
        manifest = self._manifest(stage)
        snap = manifest["current"] if snapshot_id is None else snapshot_id
        if snap is None:
            raise FileNotFoundError(f"checkpoint stage '{stage}' not committed")
        if snapshot_id is not None and not any(
            s["snapshot_id"] == snapshot_id for s in manifest["snapshots"]
        ):
            raise FileNotFoundError(f"stage '{stage}' has no snapshot {snapshot_id}")
        return spark.read.parquet(self._snap_path(stage, snap))

    def read_metrics(self, stage: str, snapshot_id: int | None = None) -> dict:
        manifest = self._manifest(stage)
        snap = manifest["current"] if snapshot_id is None else snapshot_id
        for s in manifest["snapshots"]:
            if s["snapshot_id"] == snap:
                return s
        raise FileNotFoundError(f"stage '{stage}' has no snapshot {snap}")

    def rollback(self, stage: str, snapshot_id: int) -> None:
        """Point the stage back at an earlier snapshot (Iceberg rollback)."""
        manifest = self._manifest(stage)
        if not any(s["snapshot_id"] == snapshot_id for s in manifest["snapshots"]):
            raise FileNotFoundError(f"stage '{stage}' has no snapshot {snapshot_id}")
        manifest["current"] = snapshot_id
        self._commit(stage, manifest)

    def expire_snapshots(self, stage: str, keep: int = 2) -> list[int]:
        """Delete all but the newest `keep` snapshots (the current one is
        always kept); returns the expired ids. Mirrors Iceberg's
        expire_snapshots maintenance action."""
        manifest = self._manifest(stage)
        snaps = sorted(manifest["snapshots"], key=lambda s: s["snapshot_id"])
        # snaps[-0:] would keep EVERYTHING; keep=0 means "current only"
        keep_ids = {s["snapshot_id"] for s in (snaps[-keep:] if keep > 0 else [])}
        if manifest["current"] is not None:
            keep_ids.add(manifest["current"])
        expired = [s["snapshot_id"] for s in snaps if s["snapshot_id"] not in keep_ids]
        manifest["snapshots"] = [s for s in snaps if s["snapshot_id"] in keep_ids]
        self._commit(stage, manifest)  # pointer flip first, then GC
        for sid in expired:
            shutil.rmtree(self._snap_path(stage, sid), ignore_errors=True)
        return expired

    def invalidate(self, stage: str) -> None:
        """Clear the commit pointer (stage will recompute as a NEW snapshot);
        history is preserved for rollback."""
        manifest = self._manifest(stage)
        if manifest["current"] is not None:
            manifest["current"] = None
            self._commit(stage, manifest)
