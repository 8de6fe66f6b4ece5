"""sparkextract — PySpark-native main-content extraction engine.

A from-scratch rebuild of the query/data-processing capabilities of
leiliu500/pdf_table_extraction (reference read-only at /root/reference)
on Apache Spark: one deterministic pure-pandas extraction core executed
inside Arrow-batched ``mapInPandas``, DataFrame/SQL for everything
relational, parquet/Iceberg-style bucketed output with a checkpoint
manifest for idempotent resume.
"""

__version__ = "0.1.0"
