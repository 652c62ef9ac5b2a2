"""Table loaders for the driver fixtures (SURVEY.md §1.2, a1/a7 scans).

All ten tables are single parquet files per scale-factor directory.
At 100 TB these would be partitioned datasets (e.g. orders/lineitem
partitioned by date); ``load`` takes any path Spark's parquet source
accepts, so the same call works on a partitioned directory — partition
pruning and predicate pushdown then come free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _events_confs(spark: SparkSession) -> None:
    # events.parquet stores INT64 TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects; read nanos as long and convert. UTC session tz keeps
    # timestamp wall-clock aligned with the DuckDB oracle (naive reads).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """a1_parquet_scan: columnar scan of one fixture table."""
    if name == "events":
        _events_confs(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # ns → µs truncation (matches DuckDB TIMESTAMP_NS::TIMESTAMP)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_stream_schema_cache: dict[str, object] = {}


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a8_stream_source: the events table as an unbounded streaming
    source (file source requires an explicit schema); same ns→µs
    conversion as the batch path so stream/batch plans are equivalent.
    The schema probe (a batch footer read) is cached per sf_dir — the
    i-family runs a dozen streaming queries against the same fixture."""
    _events_confs(spark)
    raw_schema = _stream_schema_cache.get(sf_dir)
    if raw_schema is None:
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        _stream_schema_cache[sf_dir] = raw_schema
    # the file stream source wants a directory; stage the single-file
    # fixture behind a per-sf temp dir (symlink — no data copy)
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    stage = os.path.join(tempfile.gettempdir(), f"json2hbase_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for the SQL path
    (SURVEY.md §3.4) — needed for GROUPING SETS and SQL-expressed ops."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
