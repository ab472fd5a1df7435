"""Scale operations for large training-data pipelines.

These are DataFrame -> DataFrame functions (not DataSet methods): they
compose with either the tuplex_spark DataSet API (via .toDF()) or plain
PySpark.  Every function here is built from JVM-side built-in functions
(no Python UDFs in the hot path) so plans stay inside whole-stage codegen
and scale to cluster datasets; each has an exact ANSI-SQL twin used as the
DuckDB correctness oracle (see __spark_entry__.py).
"""

from . import dedup, similarity, text, multimodal  # noqa: F401
