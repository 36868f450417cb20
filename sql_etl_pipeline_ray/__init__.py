"""sql_etl_pipeline_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-imagination of the capabilities of the reference repo
``okeafeez/sql-etl-pipeline`` (single-process pandas + PostgreSQL ETL with
``INSERT ... ON CONFLICT DO UPDATE`` upserts, incremental high-water-mark
extraction, window-function analytics) as an idiomatic Ray Data pipeline:

- change-event log (insert/update/delete keyed by ``(repo, path)`` with a
  monotonic LSN) read from Parquet with LSN-bucket pruning,
- stateless ``map_batches`` normalization/validation over zero-copy Arrow,
- one hash-partitioning shuffle on ``(repo, path)``,
- per-partition last-writer-wins merge (the reference's
  ``ON CONFLICT DO UPDATE`` + ``ROW_NUMBER() ... = 1`` pick-latest idiom,
  sql/etl_transformations.sql:27-38 and complex_queries.sql:27),
- an exactly-once partitioned Parquet sink committed via atomic-rename
  manifest files, resumable from per-partition LSN checkpoints,
- Arrow schema unification (add-column / type-widen) mid-stream,
- per-partition lineage + event-count metrics.

No code is copied from the reference; file:line citations in docstrings
point at the behavior being matched, not at code being reused.
"""

__version__ = "0.1.0"
