"""SparkSession builder with engine defaults (SURVEY.md §7 slice 0).

Defaults are chosen for correctness + scale posture:
- AQE on (runtime re-planning, skew-join handling, partition coalescing)
- CBO on (join reordering when stats exist)
- UTC session timezone (deterministic timestamp semantics vs the
  DuckDB oracle, which reads parquet timestamps as naive wall-clock)
- shuffle partitions sized for the local harness; at cluster scale AQE
  coalesces / splits from this initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.cbo.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # Arrow for any pandas-UDF path (K ops) and toPandas in tests.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(app_name: str = "json2hbase_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for the local harness; on a real cluster leave unset and submit via
    spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-provided
    session (the driver supplies its own SparkSession to entry()/queries())."""
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs can't change post-start; defaults are fine
    return spark
