"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10) — incremental behavior is
file-existence skip logic + append-then-reaggregate. The engine mirrors that:
resumability is Iceberg-style stage checkpoints, and `ingest.py` provides the
batch-incremental merge pattern (new pages -> incremental blocking keys ->
re-cluster affected components only) as a micro-batch `foreachBatch` job.
"""
