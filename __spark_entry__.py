"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``json2hbase_spark``; this module only adapts
the engine's query registry to the driver's contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from json2hbase_spark import registry  # noqa: E402
from json2hbase_spark.session import apply_engine_confs  # noqa: E402

registry.load_all_query_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary, d1_agg_hash)
    on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_confs(spark)
    return registry.QUERIES["d1_agg_hash"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI twin for each SQL-expressible query; ops without an
    entry get the driver's weaker rows-only check."""
    return dict(registry.ORACLES)
