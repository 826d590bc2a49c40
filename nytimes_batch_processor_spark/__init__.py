"""nytimes_batch_processor_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL job ``covid19-data-tracker/nytimes-batch-processor``
(surveyed in /root/repo/SURVEY.md), re-expressed Spark-first:

- DataFrame/SQL logical plans, Catalyst/AQE physical planning
- built-in ``pyspark.sql.functions`` in every hot path (whole-stage codegen)
- Pandas UDFs / applyInPandas only where built-ins can't express semantics
- Structured Streaming for the reference's 15-minute micro-batch loop

Layout:
    session.py     SparkSession construction + runtime-conf hardening
    schemas.py     explicit StructTypes (never inferSchema at scale)
    catalog.py     query registry: name -> (PySpark callable, DuckDB oracle)
    sources/       parquet/csv readers, fixture loader, staging
    operators/     relational / window / dedup / similarity / text ops
    functions/     scalar-function surface (string/date/math/array/json)
    streaming/     watermarked windows, foreachBatch idempotent upsert
    ingest.py      the reference's CSV->table pipeline, Spark-first
    plans/         explain/plan-inspection helpers (scale posture checks)
"""

__version__ = "0.1.0"
