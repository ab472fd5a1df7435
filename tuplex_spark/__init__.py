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

__all__ = ["Context", "DataSet", "build_session", "in_jupyter_notebook",
           "in_google_colab", "setup_aws"]
__version__ = "0.2.0"


def in_jupyter_notebook() -> bool:
    """True inside a Jupyter kernel (reference __init__ export; used to
    pick the UDF source-extraction strategy)."""
    try:
        from IPython import get_ipython
        shell = get_ipython()
        return bool(shell) and type(shell).__name__ == "ZMQInteractiveShell"
    except ImportError:
        return False


def in_google_colab() -> bool:
    """True inside Google Colab (reference __init__ export)."""
    import sys as _sys
    return "google.colab" in _sys.modules


def setup_aws(**kwargs):
    """The reference's AWS Lambda backend bootstrap.  This engine has no
    Lambda backend — distribution comes from Spark itself: point
    ``Context`` at a cluster (``spark.master``/``--master``) and every
    pipeline runs there unchanged."""
    raise NotImplementedError(
        "tuplex_spark delegates distribution to Spark; run against a "
        "cluster via spark.master instead of AWS Lambda")
