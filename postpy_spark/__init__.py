"""postpy_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``portfoliome/postpy``.

The reference (``/root/reference``, empty checkout; see SURVEY.md §0) is a
PostgreSQL ETL utility library: DDL compilation, bulk DML (insert / upsert /
COPY), catalog reflection, connection helpers, and type/encoding maps.  Every
relational operation it supports is delegated to the PostgreSQL server.  This
package re-expresses both layers Spark-first:

- ``postpy_spark.schema`` / ``etl`` / ``io`` — the postpy ETL surface
  (SURVEY.md §2 group A) natively on Spark DataFrames.
- ``postpy_spark.queries`` — the relational query surface postpy delegates to
  PostgreSQL (groups B/C/D/E), each declared in the driver contract registry.
- ``postpy_spark.streaming`` — Structured Streaming equivalents of the
  incremental-upsert workflows (group C).

Everything is built on the public PySpark 4 DataFrame / SQL API; no custom
Catalyst rules (SURVEY.md §4.1).
"""

__version__ = "0.1.0"
