"""olake_spark — brand-new PySpark-native Iceberg-style table-maintenance engine.

Re-expresses the capabilities of the reference (mrmagicpotato007/olake, a Go
database→lakehouse sync/materialization engine, see SURVEY.md) as idiomatic
Spark DataFrame/SQL jobs over a table of pre-tokenized training sequences:

- ``olake_spark.table``      — Iceberg-semantics table layer: snapshots,
  manifests with per-file min/max stats, atomic commit, snapshot-pinned scans.
- ``olake_spark.operators``  — maintenance jobs: bin-pack compaction,
  Z-order/Hilbert clustering, snapshot expiry + orphan cleanup, MERGE INTO
  (CDC apply), plus training-data ops (dedup, similarity, text analysis).
- ``olake_spark.functions``  — vectorized helpers: bit-interleave Z/Hilbert
  keys (numpy, Arrow-batched), key hashing, type coercion/promotion lattice.
- ``olake_spark.plans``      — split planners (range/ntile chunking, the
  Spark analog of the reference's chunk planners) and the lineage ledger
  that makes every maintenance job resumable.
- ``olake_spark.sources``    — testdata loaders and CDC change-batch decoding.
- ``olake_spark.streaming``  — micro-batch CDC apply (Structured Streaming).

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
selection; Python-side compute is vectorized pandas/Arrow UDFs only.
"""

__version__ = "0.1.0"
