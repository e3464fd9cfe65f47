"""PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference medallion-architecture pipeline
(soumilshah1995/Medallion-Architecture-using-Apache-Iceberg-table-buckets),
re-expressed idiomatically on DataFrame / Spark SQL / Catalyst /
Structured Streaming, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns).

Layout
------
- ``session``   : SparkSession factory (reference scripts/raw-bronze.py:102-116)
- ``schema``    : StructType utilities incl. Avro-JSON translator
                  (reference scripts/bronze-silver.py:22-57)
- ``lakehouse`` : snapshot-manifest table format over Parquet with
                  Iceberg-like semantics (append, snapshot-range
                  incremental scan, partition-scoped copy-on-write
                  MERGE, metadata tables)
- ``pipeline``  : raw->bronze ingestion and bronze->silver CDC merge
                  (reference scripts/raw-bronze.py, scripts/bronze-silver.py)
- ``operators`` : relational + LLM-data-pipeline operators
- ``functions`` : column-expression helpers (vector math, text)
- ``streaming`` : Structured Streaming ingestion variants

Import alias used throughout docs/tests::

    import medallion_architecture_using_apache_iceberg_table_buckets_spark as mats
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
