"""etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagination of the reference ETL compute graph
(an incremental, checksum-fenced dataflow engine) as a Spark
Structured-Streaming CDC pipeline:

- ``etl_spark.cdc.generator``  — deterministic change-event log (the WAL)
- ``etl_spark.lake``           — bucketed copy-on-write parquet tables with
                                 atomic snapshot commits, MERGE, schema
                                 evolution, time travel (Iceberg-like; no
                                 lakehouse jars exist in this sandbox)
- ``etl_spark.cdc.replay``     — batch replay: canonicalize → latest-wins
                                 dedup → sha256 → MERGE
- ``etl_spark.streaming``      — Structured Streaming driver with
                                 epoch-fenced exactly-once commits + lineage
- ``etl_spark.operators``      — reference-parity relational operators
- ``etl_spark.functions``      — text analysis, dedup (minhash/simhash),
                                 similarity search, multimodal plumbing
"""

__version__ = "0.1.0"
