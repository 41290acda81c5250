"""PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference system
``Arshavin023/data_ingestion_from_multiple_directories_Linux`` (a cron-driven,
pandas+PostgreSQL multi-directory JSON ingestion pipeline) as an idiomatic
Apache Spark engine:

* ``session``    – SparkSession factory tuned for local[N] and cluster use.
* ``catalog``    – test-table catalog (TPC-H-ish parquet) + view registration.
* ``sources``    – JSON-directory file source with filename→(table, batch,
                   facility) lineage parsing and schema-targeted casts.
* ``ingest``     – the ingestion engine: transform registry, PII masking,
                   null normalization, date-validation quarantine split,
                   idempotent incremental loading, audit tables.
* ``operators``  – the relational operator layer (every operator the
                   reference executes in pandas or shipped SQL, SURVEY.md §2)
                   plus large-scale training-data operators (dedup families,
                   similarity search, text analysis, multimodal plumbing).
* ``streaming``  – Structured Streaming mode: availableNow micro-batch
                   ingestion (≙ the reference's cron loop) and event-time
                   windowed aggregation.
* ``plans``      – plan-inspection helpers (pushdown/broadcast assertions).

Everything is DataFrame/SQL-first so Catalyst plans the physical execution;
Python UDFs appear only behind the sanctioned pandas-UDF escape hatch.
"""

__version__ = "0.1.0"
