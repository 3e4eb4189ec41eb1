"""data_engineer_task_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``coded4alex/data_engineer_task`` (a pandas + Postgres
ETL/analytics pipeline, surveyed in SURVEY.md): CSV ingest, a
multi-valued-attribute star-schema transform, an idempotency ledger,
and a 10-query analytics workload — generalized into a reusable
operator library and extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal columns, streaming).

Design principles (SURVEY.md §7):
 - lazy DataFrame DAG, never eager pandas; Catalyst is the optimizer
 - zero row-at-a-time Python UDFs in hot paths (broadcast lookup joins
   and native functions replace the reference's ``.apply`` UDFs)
 - every operator parameterized by schema; the Netflix pipeline is just
   the first client
 - designed for 1000-executor / 100 TB scale, tested on local[32]
"""

__version__ = "0.1.0"
