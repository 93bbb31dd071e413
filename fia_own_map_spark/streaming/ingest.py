"""Incremental page ingestion — Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.10); its incremental idiom is
append-then-reaggregate (`Full_State_Sample_Generation.py:118-127`). The
engine's streaming surface mirrors that as a `foreachBatch` job:

  new pages (file source / rate source)
    -> stage0 extract + classify (same operators as batch)
    -> incremental blocking keys appended to the key store
    -> affected components re-clustered (only blocks touched by the batch)

Re-clustering only the affected subgraph keeps each micro-batch O(batch +
touched blocks), not O(corpus): union the new (id, key) rows with existing
rows *sharing those keys*, run CC on that slice, and merge labels back
(min-id labels are stable under this merge because components only grow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.operators.blocking import blocking_keys, star_edges
from fia_own_map_spark.operators.cc import connected_components
from fia_own_map_spark.operators.refine import refine_clusters_by_address
from fia_own_map_spark.plans.pipeline import stage0_records

_LABEL_SCHEMA = (
    "url string, cluster_id string, own_type int, comb_addr string"
)


class IncrementalER:
    """Maintains (keys, labels) state across micro-batches.

    State lives in two parquet tables (checkpoint semantics identical to the
    batch job). Used from `foreachBatch` or called directly for tests.
    """

    def __init__(self, spark: SparkSession, state_dir: str, cfg: EngineConfig | None = None):
        self.spark = spark
        self.state_dir = state_dir
        self.cfg = cfg or EngineConfig()
        self._keys_path = f"{state_dir}/keys"
        self._labels_path = f"{state_dir}/labels"

    def _read_state(self, path: str, schema: str) -> DataFrame:
        try:
            return self.spark.read.parquet(path)
        except Exception:  # noqa: BLE001 — first batch: empty state
            return self.spark.createDataFrame([], schema)

    def process_batch(self, pages: DataFrame, batch_id: int = 0) -> DataFrame:
        """Ingest one micro-batch of pages; returns updated labels table."""
        records = stage0_records(pages, use_html=True).withColumn(
            "match_bucket",
            F.when(
                (F.col("own_type") == 45) & (F.col("initial_class") == 3),
                F.concat(F.col("own_type").cast("string"), F.lit("J")),
            ).otherwise(F.col("own_type").cast("string")),
        )
        new_keys = blocking_keys(
            records.filter(F.col("own_type") != -99), id_col="url",
            class_col="match_bucket",
        )
        old_keys = self._read_state(self._keys_path, "url string, block_key string")
        old_labels = self._read_state(self._labels_path, _LABEL_SCHEMA)

        # Affected slice must be closed under the OLD partition: a batch key
        # can merge two old clusters, and every member of a merged cluster
        # must be relabeled together (old clusters are CC fixpoints, so one
        # cluster-expansion hop reaches closure — any cross-cluster old key
        # would already have merged them).
        touched = new_keys.select("block_key").distinct()
        directly_affected = (
            old_keys.join(F.broadcast(touched), "block_key", "left_semi")
            .select("url")
            .distinct()
        )
        affected_clusters = (
            old_labels.join(directly_affected, "url", "left_semi")
            .select("cluster_id")
            .distinct()
        )
        affected_urls = (
            old_labels.join(affected_clusters, "cluster_id", "left_semi")
            .select("url")
            .distinct()
        )
        affected = old_keys.join(affected_urls, "url", "left_semi")
        slice_keys = affected.unionByName(new_keys).distinct()

        edges = star_edges(slice_keys, "url")
        new_labels = connected_components(
            edges,
            vertices=slice_keys.select(F.col("url").alias("id")).distinct(),
            id_col="id",
            component_col="cluster_id",
        ).withColumnRenamed("id", "url")

        # merge: re-clustered urls take the new label; others keep theirs;
        # new unknown/singleton pages default to their own url. Per-url
        # attributes (own_type, comb_addr) ride along so the family
        # address refinement can run over the merged table.
        attrs = records.select("url", "own_type", "comb_addr")
        relabeled = (
            old_labels.join(new_labels.select("url"), "url", "left_semi")
            .drop("cluster_id")
            .unionByName(attrs.join(new_labels.select("url"), "url", "left_semi"))
            .distinct()
            .join(new_labels, "url")
        )
        singletons = (
            attrs.join(new_labels.select("url"), "url", "left_anti")
            .join(old_labels.select("url"), "url", "left_anti")
            .withColumn("cluster_id", F.col("url"))
        )
        merged = (
            old_labels.join(new_labels.select("url"), "url", "left_anti")
            .unionByName(relabeled.select(*old_labels.columns))
            .unionByName(singletons.select(*old_labels.columns))
        )

        all_keys = old_keys.unionByName(new_keys).distinct()
        all_keys.write.mode("overwrite").parquet(self._keys_path + f"_v{batch_id}")
        merged.write.mode("overwrite").parquet(self._labels_path + f"_v{batch_id}")
        # version flip (atomicity stand-in for Iceberg snapshot commit)
        self._keys_path = self._keys_path + f"_v{batch_id}"
        self._labels_path = self._labels_path + f"_v{batch_id}"
        # output view: family/juniors clusters split by address (the batch
        # pipeline applies the same refinement after CC)
        return refine_clusters_by_address(self.spark.read.parquet(self._labels_path))

    def attach_stream(self, pages_stream: DataFrame, checkpoint: str):
        """Wire into Structured Streaming via foreachBatch."""
        return (
            pages_stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
