"""Batch parquet scans of the driver fixture tables (SURVEY §2.1 S9).

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown, column
pruning and (for partitioned layouts) partition pruning for free; do not
wrap scans in anything that would hide the file source from the optimizer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from eventsgateway_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Path layout per TESTDATA.md.

    Delegates to the same loader the query registry uses so both
    surfaces see identical schemas — in particular ``events.ts``
    (parquet TIMESTAMP(NANOS)) is normalized to a µs timestamp instead
    of crashing the read or leaking a raw bigint.
    """
    from eventsgateway_spark.queries._util import table

    return table(spark, sf_dir, name)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table PRESENT in ``sf_dir`` as a temp
    view for spark.sql use. Missing files are skipped rather than
    failing the whole Engine construction — a TPC-H-only fixture dir
    (no documents/embeddings) should still serve relational queries;
    a query touching an unregistered view fails at ITS call site with
    a clear table-not-found error."""
    import os

    for name in TESTDATA_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
