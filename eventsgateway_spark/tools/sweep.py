"""Driver-faithful correctness sweep of the declared query surface.

Reproduces what the round driver does — a VANILLA SparkSession (no
engine confs, ANSI on by Spark 4 default, optionally a hostile
timezone) importing ``__spark_entry__`` and comparing every declared
query against its DuckDB oracle at sf0.01 — so a rotation flip or a
lineage-touching change can be verified before the driver runs.

Usage (the committed protocol, SURVEY §2.5):

    TZ=Pacific/Kiritimati SPARK_GRAFT_ROUND=<n> \
        python -m eventsgateway_spark.tools.sweep

``SPARK_GRAFT_ROUND`` selects the rotation phase (defaults to the
committed ``ROUND`` file via the registry's ``current_round``); the
process TZ must be set BEFORE the JVM starts — ``collect()`` renders
TIMESTAMP through the process zone, which is exactly the class of
drift the hostile zone exists to catch (the q59 bare-timestamp bug,
SURVEY §2.5 round-8 note).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    # vanilla session — deliberately NOT session.get_spark(): the
    # driver's session carries none of the engine confs, and a query
    # that only passes under them is a contract bug
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    print("entry rows:", e.entry(spark).count(), flush=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle_harness import compare_spark_duckdb

    qs, osql = e.queries(), e.oracle_sql()
    ok = 0
    for name in sorted(qs):
        if name not in osql:
            n = qs[name](spark, SF_DIR).count()
            print("rows-only:", name, n, flush=True)
        else:
            compare_spark_duckdb(qs[name](spark, SF_DIR), con, osql[name])
            print("oracle match:", name, flush=True)
        ok += 1
    print(f"TOTAL OK: {ok} / {len(qs)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
