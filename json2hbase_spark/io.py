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
    # Fixture generations have stored events.ts as INT64 TIMESTAMP(NANOS)
    # (which Spark's parquet reader rejects without nanosAsLong) or as
    # plain timestamp[us]. Enable the legacy read so both load; UTC
    # session tz keeps timestamp wall-clock aligned with the DuckDB
    # oracle (naive reads).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to session-tz TIMESTAMP regardless of how the
    fixture generation encoded it: INT64 nanos → µs truncation (matches
    DuckDB TIMESTAMP_NS::TIMESTAMP); parquet timestamp[us] (inferred as
    TIMESTAMP_NTZ by Spark 4) → same wall clock in the UTC session tz,
    identical to DuckDB's naive read."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if t == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def widen(df: DataFrame) -> DataFrame:
    """Repartition up to default parallelism when the upstream scan
    yields fewer splits than cores. The local fixtures are single
    parquet files under maxPartitionBytes → ONE scan partition, so any
    fan-out work downstream (shingling, tokenizing, per-row hashing)
    would run on one thread; a real cluster's scan already yields
    >> cores splits and this is a no-op. Only wrap compute-heavy
    per-row pipelines — a blanket repartition in ``load`` would inject
    a shuffle into every plan."""
    if df.isStreaming:
        # .rdd is unsupported on a streaming DataFrame; micro-batch
        # parallelism is governed by maxFilesPerTrigger/source splits.
        return df
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """a1_parquet_scan: columnar scan of one fixture table."""
    if name == "events":
        _events_confs(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return _normalize_events_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# keyed on (sf_dir, mtime, size) so a regenerated fixture with a new
# schema is re-probed instead of silently streaming with a stale one
_stream_schema_cache: dict[tuple, object] = {}


def _stage_symlink(link: str, src: str) -> None:
    """Idempotent, race-safe symlink staging: lexists (not exists)
    catches dangling links left by a removed/renamed sf_dir, a stale
    or wrong-target link is replaced, and the create is wrapped for
    the window where a concurrent session links first."""
    import os

    if os.path.lexists(link):
        try:
            if os.readlink(link) == src and os.path.exists(link):
                return
        except OSError:
            pass
        try:
            os.unlink(link)
        except IsADirectoryError:
            # a real directory at the staged path (leftover from an
            # older layout) — replace it
            import shutil

            shutil.rmtree(link, ignore_errors=True)
        except OSError:
            pass  # e.g. EPERM — the symlink create below surfaces it
    try:
        os.symlink(src, link)
    except FileExistsError:
        # Acceptable only if a concurrent session raced us to the SAME
        # target; a stale entry that survived a failed unlink must not
        # be served silently.
        try:
            if os.readlink(link) == src:
                return
        except OSError:
            pass
        raise


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a8_stream_source: the events table as an unbounded streaming
    source (file source requires an explicit schema); same ns→µs
    conversion as the batch path so stream/batch plans are equivalent.
    The schema probe (a batch footer read) is cached per sf_dir — the
    i-family runs a dozen streaming queries against the same fixture."""
    _events_confs(spark)
    import os
    import tempfile

    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)
    cache_key = (sf_dir, st.st_mtime_ns, st.st_size)
    raw_schema = _stream_schema_cache.get(cache_key)
    if raw_schema is None:
        raw_schema = spark.read.parquet(src).schema
        _stream_schema_cache[cache_key] = raw_schema
    # the file stream source wants a directory; stage the single-file
    # fixture behind a per-sf temp dir (symlink — no data copy)
    # Key the stage dir on source generation (mtime/size — the same
    # identity the schema cache uses): a re-generated fixture gets a
    # FRESH stage dir, so two sessions staging different generations
    # of the same sf_dir never mutate a shared directory (ADVICE r9).
    tag = sf_dir.strip("/").replace("/", "_")
    gen = f"{st.st_mtime_ns:x}_{st.st_size:x}"
    stage = os.path.join(tempfile.gettempdir(), f"json2hbase_stream_{tag}_{gen}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    _stage_symlink(link, src)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    return _normalize_events_ts(stream)


def load_table_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Any fixture table as an unbounded streaming source — the same
    schema-probe + symlink-staging path as ``load_events_stream`` (the
    file source needs an explicit schema and a directory), without the
    events-only timestamp normalization. Used by streaming corpus ops
    (i24) that stream ``documents`` instead of ``events``."""
    import os
    import tempfile

    src = f"{sf_dir}/{table}.parquet"
    st = os.stat(src)
    cache_key = (sf_dir, table, st.st_mtime_ns, st.st_size)
    raw_schema = _stream_schema_cache.get(cache_key)
    if raw_schema is None:
        raw_schema = spark.read.parquet(src).schema
        _stream_schema_cache[cache_key] = raw_schema
    # Generation-keyed stage dir (mtime/size, like load_events_stream):
    # each fixture generation stages into its own directory, so the
    # stale-entry cleanup below only ever handles SAME-generation
    # re-stages and concurrent sessions can't delete each other's
    # links (ADVICE r9).
    tag = sf_dir.strip("/").replace("/", "_")
    gen = f"{st.st_mtime_ns:x}_{st.st_size:x}"
    stage = os.path.join(
        tempfile.gettempdir(), f"json2hbase_stream_{table}_{tag}_{gen}"
    )
    os.makedirs(stage, exist_ok=True)
    if os.path.isdir(src):
        # a real (directory-shaped) parquet table: the file stream
        # source lists the stage dir NON-recursively, so a symlinked
        # subdirectory would read as zero files — link each data file
        # into the stage dir instead (still no data copy).
        want = {f for f in os.listdir(src) if f.endswith(".parquet")}
    else:
        want = {f"{table}.parquet"}
    # The stage dir is deterministic and persists across runs: a
    # re-generated fixture changes Spark part-file names every write,
    # so entries from the PREVIOUS generation (dangling links, or a
    # file-shaped '<table>.parquet' link from a prior source shape)
    # would make the stream fail on dangling files or read the table
    # twice (ADVICE r8). Drop anything not in the current source set.
    for f in os.listdir(stage):
        if f.endswith(".parquet") and f not in want:
            try:
                os.unlink(os.path.join(stage, f))
            except OSError:
                pass
    if os.path.isdir(src):
        for f in sorted(want):
            _stage_symlink(os.path.join(stage, f), os.path.join(src, f))
    else:
        _stage_symlink(os.path.join(stage, f"{table}.parquet"), src)
    return spark.readStream.schema(raw_schema).parquet(stage)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> None:
    """Register fixture tables as temp views for the SQL path
    (SURVEY.md §3.4) — needed for GROUPING SETS and SQL-expressed ops.
    Pass ``only`` to register just the tables a query touches: each
    registration re-reads parquet footers, so view setup is O(tables)
    of driver round-trips a hot query shouldn't pay for unused views."""
    for name in only if only is not None else TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
