"""tuplex_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Tuplex system, rebuilt
Spark-first (DataFrame/Catalyst; no execution engine of our own).

Public surface:
    Context            entry point (parallelize/csv/text/orc/parquet)
    DataSet            lazy transform chain (map/filter/join/aggregate/...)
    functions.*        scale ops: dedup, similarity search, text analysis
"""

from .context import Context, build_session
from .dataset import DataSet

__all__ = ["Context", "DataSet", "build_session"]
__version__ = "0.1.0"
