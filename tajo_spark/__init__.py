"""tajo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/tajo (reference blueprint in
SURVEY.md), extended with large-scale training-data pipeline operators.

Everything is expressed through the Spark DataFrame/SQL API so Catalyst
+ Tungsten + AQE own the physical strategy (SURVEY.md §4 maps each of
the reference's optimizer rules to a built-in Catalyst rule).
"""

from tajo_spark.session import build_spark
from tajo_spark.catalog import register_tables, load_table


def engine(*args, **kwargs):
    """Convenience constructor for the client API:
    ``tajo_spark.engine().execute_sql(...)``. Lazy import keeps bare
    ``import tajo_spark`` free of SparkSession side effects."""
    from tajo_spark.engine import Engine

    return Engine(*args, **kwargs)


__all__ = ["build_spark", "register_tables", "load_table", "engine"]
