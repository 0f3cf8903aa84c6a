"""Engine façade — the user-facing surface of the PySpark-native engine.

Replaces the reference's Go client/server pair (client/client.go,
server/app/server.go) with a single Python object that owns the
SparkSession, the declared schemas, the fixture-table catalog, and the
registered analytics queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from eventsgateway_spark.session import get_spark
from eventsgateway_spark.sources.tables import DEFAULT_SF_DIR, load_table, register_views


class Engine:
    """Session + catalog + query registry in one handle.

    >>> eng = Engine(sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("select count(*) n from lineitem").show()
    """

    def __init__(self, spark: SparkSession | None = None, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a registered query from the engine's declared surface."""
        from eventsgateway_spark.queries import QUERIES

        return QUERIES[name](self.spark, self.sf_dir)
