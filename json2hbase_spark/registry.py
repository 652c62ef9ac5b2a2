"""Query registry — the bridge between engine operators and the
driver contract in __spark_entry__.py.

Each operator from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame
callable under its stable id, optionally with a DuckDB-ANSI oracle SQL
twin. ``__spark_entry__.queries()`` / ``oracle_sql()`` read these dicts.

Conventions enforced by review (SURVEY.md §2 tail):
- alias every computed column identically in Spark and SQL
- round(x, 2) on float aggregates
- deterministic content (no first() without ordering)
- timestamps surfaced as strings/dates, never raw TIMESTAMP columns
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under its SURVEY §2 id, with optional DuckDB twin."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from json2hbase_spark.plans import (  # noqa: F401
        etl_queries,
        relational_queries,
        window_queries,
        streaming_queries,
        llm_queries,
        udf_queries,
        advanced_queries,
        corpus_queries,
        pipeline_queries,
        curation_queries,
        selection_queries,
        audit_queries,
        vector_queries,
    )
