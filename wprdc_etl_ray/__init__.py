"""wprdc_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

From-scratch engine with the query/data-processing capabilities of
WPRDC/wprdc-etl (pluggable extract → schema-validate → keyed-upsert load
with idempotence bookkeeping), generalized into a binlog-style
change-event tailer over Parquet-backed transcript tables:

- change events stream through ``ray.data.Dataset`` with ``map_batches``
  over zero-copy Arrow batches,
- hash-partitioned by ``conv_id`` (salted sub-keys for hot
  conversations) into LSM-style last-writer-wins upsert merges,
- committed to partitioned Parquet via an idempotent two-phase manifest
  commit (exactly-once), with per-partition watermarks + lineage.

See SURVEY.md for the blueprint and the reference-parity map.
"""

__version__ = "0.1.0"
