"""E/F/G/H-ops: windows, sorts/limits, set ops, scalar-function bundles
(SURVEY.md §2). All native expressions — no UDFs, whole-stage codegen
throughout; window ops shuffle once on their partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from json2hbase_spark.io import load
from json2hbase_spark.registry import query

# ---------------------------------------------------------------- E ops


@query(
    "e1_win_rank",
    oracle="""
    SELECT c_nationkey, c_custkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS prank
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def e1_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("prank"),
    )


@query(
    "e2_win_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice AS price,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           o_totalprice - coalesce(lag(o_totalprice) OVER w, 0) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def e2_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0))).alias(
            "delta"
        ),
    )


@query(
    "e3_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
)
def e3_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias(
            "running_spend"
        ),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "e4_win_moving",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5,
           MIN(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS min5
    FROM orders
    """,
)
def e4_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-4, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("ma5"),
        F.min("o_totalprice").over(w).alias("min5"),
    )


@query(
    "e5_win_firstlast",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def e5_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


@query(
    "e6_topk_pergroup",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal AS acctbal, rn AS rank_in_nation
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    """,
)
def e6_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.col("rn").alias("rank_in_nation"),
        )
    )


# ---------------------------------------------------------------- F ops


@query(
    "f1_sort_multi",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal AS acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC NULLS LAST, s_name ASC
    """,
)
def f1_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + per-partition
    sort). The driver hash is order-insensitive; determinism of content
    is what matters."""
    s = load(spark, sf_dir, "supplier")
    return s.orderBy(
        F.col("s_nationkey").asc(),
        F.col("s_acctbal").desc_nulls_last(),
        F.col("s_name").asc(),
    ).select("s_suppkey", "s_name", "s_nationkey", F.col("s_acctbal").alias("acctbal"))


@query(
    "f2_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS price
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def f2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("price"))
    )


@query(
    "f3_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def f3_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k WITHOUT a total sort: orderBy().limit() planned as
    TakeOrderedAndProject — per-partition heaps + driver merge, the
    only top-k that works on 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("o_totalprice").alias("price"))
    )


# ---------------------------------------------------------------- G ops


@query(
    "g1_union_all",
    oracle="""
    SELECT c_custkey AS custkey, 'BUILDING' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT o_custkey AS custkey, 'URGENT' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("BUILDING").alias("src")
    )
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey"), F.lit("URGENT").alias("src")
    )
    return left.unionByName(right)


@query(
    "g2_union_distinct",
    oracle="""
    SELECT custkey FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return left.unionByName(right).distinct()


@query(
    "g3_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "g4_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


# ---------------------------------------------------------------- H ops


@query(
    "h1_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           lower(p_name) AS name_lo,
           substr(p_name, 1, 6) AS name6,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_type, 'TYPE', 'T') AS type_short,
           string_split(p_type, '_')[1] AS type_head,
           regexp_extract(p_type, '([0-9]+)$', 1) AS type_num,
           concat(p_brand, ':', p_type) AS brand_type,
           trim('  x  ') AS trimmed
    FROM part
    """,
)
def h1_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_name").alias("name_lo"),
        F.substring("p_name", 1, 6).alias("name6"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_type"), F.lit("TYPE"), F.lit("T")).alias("type_short"),
        F.element_at(F.split("p_type", "_"), 1).alias("type_head"),
        F.regexp_extract("p_type", "([0-9]+)$", 1).alias("type_num"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


@query(
    "h2_fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           quarter(o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE)::VARCHAR AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS plus30,
           last_day(CAST(o_orderdate AS DATE))::VARCHAR AS month_end
    FROM orders
    """,
)
def h2_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.last_day(d).cast("string").alias("month_end"),
    )


@query(
    "h3_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(sqrt(l_extendedprice), 4) AS price_sqrt,
           round(ln(l_extendedprice), 4) AS price_ln,
           round(log10(l_extendedprice), 4) AS price_log10,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           l_orderkey % 7 AS key_mod,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_quantity, 25.0) AS qty_lo
    FROM lineitem
    """,
)
def h3_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice").cast("decimal(12,2)"), 1).cast("double").alias(
            "price_r1"
        ),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.sign(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
    )


@query(
    "h4_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'), 4) AS norm2,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
           round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE), 4) + 0.0 AS first_two_sum
    FROM embeddings
    """,
)
def h4_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — the JVM-native path for vector
    math (no Python UDF, stays in codegen). first_two_sum (the one
    rounded column whose domain straddles zero) adds +0.0 after the
    round on BOTH sides: DuckDB's round preserves the sign of a
    tiny-negative input (-0.00004 -> -0.0) while Spark's BigDecimal
    round returns +0.0, and a signed-zero disagreement breaks the
    value-hash row alignment (surfaced by the sf0.1 cross-sweep;
    IEEE -0.0 + 0.0 = +0.0 normalizes it identically in both
    engines)."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x), 4
        ).alias("norm2"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(emb).cast("double"), 4).alias("max_val"),
        (
            F.round(
                F.element_at(emb, 1).cast("double") + F.element_at(emb, 2).cast("double"),
                4,
            )
            + F.lit(0.0)
        ).alias("first_two_sum"),
    )


@query(
    "h5_fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           2 AS n_keys,
           CAST(round(value, 2) AS VARCHAR) AS val_str
    FROM events
    """,
)
def h5_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + extraction (oracle states the equivalent
    result directly — DuckDB's map dialect differs, the values don't)."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("val"), F.round("value", 2).cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, F.lit("type")).alias("type_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, F.lit("val")).alias("val_str"),
    )


@query(
    "h6_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS k_missing,
           to_json(json_object('k', CAST(json_extract_string(props, '$.k') AS INTEGER)))::VARCHAR AS rebuilt
    FROM events
    """,
)
def h6_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
        F.to_json(F.struct(k_int.alias("k"))).alias("rebuilt"),
    )


@query(
    "h7_fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) AS key_salt
    FROM customer
    """,
)
def h7_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2).alias("key_salt"),
    )


@query("h7b_fn_hash_native")  # rows-only: xxhash64/crc32 are Spark-specific hashes
def h7b_fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hash functions (used by minhash j9 and region
    bucketing) — no DuckDB equivalent, rows-only check."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("name_xxh"),
        F.crc32("c_name").alias("name_crc32"),
        F.hash("c_name").alias("name_murmur"),
    )


@query(
    "h9_percentile_approx",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS median_r,
           COUNT(*) AS n,
           TRUE AS within_tol
    FROM events
    GROUP BY event_type
    """,
)
def h9_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (Greenwald-Khanna sketch — the mergeable
    constant-memory quantile at 100 TB) with a d3-style tolerance
    oracle: output carries the EXACT interpolated median (hash-checked
    against DuckDB's quantile_cont, round 4 per the exact.py
    convention for interpolated stats) plus ``within_tol`` asserting
    the sketch estimate lands between the exact 45th and 55th
    percentiles — the rank-error contract of accuracy=10000."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("_approx"),
        F.expr("percentile(value, 0.45D)").alias("_p45"),
        F.expr("percentile(value, 0.55D)").alias("_p55"),
        F.expr("percentile(value, 0.5D)").alias("_median"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "event_type",
        F.round("_median", 4).alias("median_r"),
        "n",
        (
            (F.col("_approx") >= F.col("_p45")) & (F.col("_approx") <= F.col("_p55"))
        ).alias("within_tol"),
    )


@query(
    "h10_histogram",
    oracle="""
    SELECT bin,
           CAST(bin * 25000 AS BIGINT) AS lo,
           CAST((bin + 1) * 25000 AS BIGINT) AS hi,
           COUNT(*) AS n
    FROM (
      SELECT least(CAST(floor(o_totalprice / 25000) AS BIGINT), 19) AS bin
      FROM orders
    )
    GROUP BY bin
    """,
)
def h10_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 bins of 25k, top bin open-ended): one
    narrow map + one hash agg — the profiling primitive that replaces
    a sort-based percentile scan when you only need the distribution
    shape at 100 TB."""
    o = load(spark, sf_dir, "orders")
    bin_col = F.least(F.floor(F.col("o_totalprice") / 25000).cast("bigint"), F.lit(19))
    return (
        o.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * 25000).cast("bigint").alias("lo"),
            ((F.col("bin") + 1) * 25000).cast("bigint").alias("hi"),
            "n",
        )
    )


@query(
    "f6_range_partition",
    oracle="""
    SELECT tile,
           COUNT(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             ntile(32) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
      FROM orders
    )
    GROUP BY tile
    """,
)
def f6_range_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition balance profile: ntile(32) over a total order —
    the split-point computation behind repartitionByRange / sorted
    bulk-load region boundaries (a5). Each tile's count stays within
    ±1 of n/32, and the (lo, hi) bounds are the region split points a
    100 TB sorted write would use. (The global sort here is the
    profiling step, run on a sample at scale — Spark's
    RangePartitioner does exactly this sampling internally.)"""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    tile = F.ntile(32).over(W.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey")))
    return (
        o.select("o_totalprice", tile.alias("tile"))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "h11_quartiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 4) AS p25_r,
           round(quantile_cont(value, 0.50), 4) AS p50_r,
           round(quantile_cont(value, 0.75), 4) AS p75_r,
           round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4) AS iqr_r,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def h11_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartile band per group (p25/p50/p75 + IQR): the spread
    profile behind outlier fences and box plots. Spark's exact
    `percentile` and DuckDB's `quantile_cont` share the linear
    interpolation formula; round(4) per the exact.py convention for
    interpolated statistics. At 100 TB swap in percentile_approx
    (h9 shows the sketch + tolerance contract)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25D)").alias("_p25"),
        F.expr("percentile(value, 0.50D)").alias("_p50"),
        F.expr("percentile(value, 0.75D)").alias("_p75"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "event_type",
        F.round("_p25", 4).alias("p25_r"),
        F.round("_p50", 4).alias("p50_r"),
        F.round("_p75", 4).alias("p75_r"),
        F.round(F.col("_p75") - F.col("_p25"), 4).alias("iqr_r"),
        "n",
    )


@query(
    "e8_win_distribution",
    oracle="""
    SELECT p_brand, p_partkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           ntile(4) OVER w AS quartile
    FROM part
    WHERE p_size <= 10
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def e8_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist /
    ntile): per-brand price positioning. percent_rank and cume_dist
    are rational counts divided once in IEEE double — identical bits
    in any engine, so no rounding is needed. Deterministic tiebreak on
    p_partkey keeps ntile assignment engine-stable. One shuffle on
    p_brand; the frame never materializes (rank-family functions
    stream within the sorted partition)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "h12_bitmap_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def h12_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps (bitmap_construct_agg /
    bitmap_count): ids map to (bucket, bit) pairs, each group×bucket
    folds into a fixed 4KB bitmap with map-side combine, and the
    distinct count is the sum of OR-merged bitmap popcounts. Unlike
    count(distinct) this never shuffles raw ids — the shuffle payload
    is bounded by buckets × 4KB regardless of cardinality, and bitmaps
    re-merge associatively (the roaring-style path for 100 TB distinct
    counts and incremental rollups). Hash-checked against DuckDB's
    plain COUNT(DISTINCT)."""
    ev = load(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bkt"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(
            F.bitmap_construct_agg("pos").alias("bm"),
            F.count(F.lit(1)).alias("n_ev"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users"),
        F.sum("n_ev").alias("n_events"),
    )


@query(
    "h13_hll_union",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(DISTINCT date_trunc('hour', ts::TIMESTAMP)) AS n_hours,
           TRUE AS within_tol
    FROM events
    GROUP BY event_type
    """,
)
def h13_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg /
    hll_union_agg): one sketch per (event_type, hour) partial — the
    shape a 100 TB rollup stores per partition/day — then re-merged
    across hours and estimated. d3-style tolerance oracle: the output
    carries the EXACT distinct count (hash-checked) plus within_tol =
    |estimate − exact| ≤ 3·rsd·exact with rsd ≈ 1.04/√2^12 for the
    default lgConfigK=12. NOTE: a within_tol failure right after a
    fixture change means re-validating the band, not a plan bug."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hr"), "user_id"
    ).groupBy("event_type", "hr").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    merged = hourly.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    rsd = 1.04 / (2 ** 6)  # lgConfigK=12 → m=4096, rsd = 1.04/sqrt(m)
    tol = F.lit(3.0 * rsd) * F.col("exact_users").cast("double")
    return (
        merged.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_hours",
            (F.abs(F.col("_est").cast("double") - F.col("exact_users")) <= tol).alias(
                "within_tol"
            ),
        )
    )


@query(
    "g5_recursive_cte",
    oracle="""
    WITH RECURSIVE walk(nk, cur, depth) AS (
      SELECT n_nationkey, n_nationkey, 0 FROM nation
      UNION ALL
      SELECT w.nk, CAST(FLOOR(w.cur / 5.0) AS INT), w.depth + 1
      FROM walk w WHERE w.cur >= 5
    )
    SELECT nk AS n_nationkey,
           MAX(depth) AS depth,
           CAST(MAX_BY(cur, depth) AS INT) AS root
    FROM walk
    GROUP BY nk
    """,
)
def g5_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk a synthetic
    5-ary hierarchy over nation keys (parent = floor(key/5)) to each
    node's root and depth — the transitive-closure shape (org charts,
    BOM explosions, category trees) that previously needed a driver
    loop; the engine now iterates UNION ALL steps until fixpoint.
    DuckDB runs the identical recursion, so depth and root hash-match."""
    from json2hbase_spark.io import register_views

    register_views(spark, sf_dir, only=("nation",))
    return spark.sql(
        """
        WITH RECURSIVE walk(nk, cur, depth) AS (
          SELECT n_nationkey, n_nationkey, 0 FROM nation
          UNION ALL
          SELECT w.nk, CAST(FLOOR(w.cur / 5.0) AS INT), w.depth + 1
          FROM walk w WHERE w.cur >= 5
        )
        SELECT nk AS n_nationkey,
               MAX(depth) AS depth,
               CAST(MAX_BY(cur, depth) AS INT) AS root
        FROM walk
        GROUP BY nk
        """
    )


@query(
    "h14_theta_sets",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM c) AS exact_click,
           (SELECT COUNT(*) FROM p) AS exact_purchase,
           (SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS exact_both,
           (SELECT COUNT(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM p))
             AS exact_any,
           TRUE AS union_tol, TRUE AS inter_tol, TRUE AS diff_tol
    """,
)
def h14_theta_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra (Apache DataSketches): distinct-user
    sketches built per (event_type, hour) partial, re-merged with
    theta_union_agg, then AUDIENCE OVERLAP via theta_intersection /
    theta_union / theta_difference — the only sketch family that
    answers "how many users did BOTH X and Y" without co-shuffling raw
    ids (HLL cannot intersect). d3-style tolerance oracle: exact
    counts hash-checked, each estimate asserted within 3·rse of exact
    where rse ≈ 1/√2¹² scaled by the union size for intersection /
    difference (the DataSketches error model)."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    merged = hourly.groupBy("event_type").agg(F.expr("theta_union_agg(sk)").alias("sk"))
    c = merged.filter(F.col("event_type") == "click").select(F.col("sk").alias("sk_c"))
    p = merged.filter(F.col("event_type") == "purchase").select(
        F.col("sk").alias("sk_p")
    )
    ests = c.crossJoin(p).select(
        F.expr("theta_sketch_estimate(sk_c)").alias("_e_c"),
        F.expr("theta_sketch_estimate(sk_p)").alias("_e_p"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_c, sk_p))").alias("_e_both"),
        F.expr("theta_sketch_estimate(theta_union(sk_c, sk_p))").alias("_e_any"),
        F.expr("theta_sketch_estimate(theta_difference(sk_c, sk_p))").alias("_e_diff"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        clicks.agg(F.count(F.lit(1)).alias("exact_click"))
        .crossJoin(purch.agg(F.count(F.lit(1)).alias("exact_purchase")))
        .crossJoin(
            clicks.join(purch, "user_id").agg(F.count(F.lit(1)).alias("exact_both"))
        )
        .crossJoin(
            clicks.unionByName(purch)
            .distinct()
            .agg(F.count(F.lit(1)).alias("exact_any"))
        )
    )
    rse = 3.0 / (2 ** 6)  # 3 x 1/sqrt(2^12), the default lgK
    out = ests.crossJoin(F.broadcast(exact))
    band = F.lit(rse) * F.col("exact_any").cast("double")
    return out.select(
        "exact_click",
        "exact_purchase",
        "exact_both",
        "exact_any",
        (F.abs(F.col("_e_any") - F.col("exact_any")) <= band).alias("union_tol"),
        (F.abs(F.col("_e_both") - F.col("exact_both")) <= band).alias("inter_tol"),
        (
            F.abs(F.col("_e_diff") - (F.col("exact_click") - F.col("exact_both")))
            <= band
        ).alias("diff_tol"),
    )


@query(
    "h15_approx_topk",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    LIMIT 3
    """,
)
def h15_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via approx_top_k (DataSketches frequent-items):
    one pass, mergeable, bounded memory — the 100 TB replacement for
    ORDER BY count LIMIT k over a full aggregate. With maxItemsTracked
    (10000) far above the column's cardinality the sketch counts are
    exact, so the result hash-matches the exact top-3; re-ranked by
    (count DESC, item) so ordering is engine-stable. NOTE: equal
    counts between rank-3 and rank-4 items after a fixture change
    would be a tie the two engines may break differently — d3's
    re-validate-on-fixture-change caveat applies."""
    ev = load(spark, sf_dir, "events")
    top = ev.agg(F.expr("approx_top_k(event_type, 3, 10000)").alias("tk"))
    return (
        top.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"), F.col("e.count").alias("n_events")
        )
        .orderBy(F.desc("n_events"), "event_type")
    )


@query(
    "g6_except_all",
    oracle="""
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 10
    EXCEPT ALL
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 40
    """,
)
def g6_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): multiplicity-aware subtraction —
    each (flag, status) pair survives max(n_left − n_right, 0) times,
    unlike g4's set EXCEPT which collapses to distinct rows. Spark
    plans this as a count-propagating aggregate (Generate over
    replicated counts), one shuffle; the SQL-standard bag semantics
    both engines share make it hash-checkable even with duplicate
    rows."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_quantity") > 40).select("l_returnflag", "l_linestatus")
    return a.exceptAll(b)


@query(
    "e9_ignore_nulls_nav",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS ts,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
      FROM events
    )
    SELECT user_id, event_id,
           last_value(purchase_value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value,
           lag(purchase_value, 1 IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_purchase_value
    FROM e
    """,
)
def e9_ignore_nulls_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: carry the most recent non-null
    observation forward (last_value) and reach back past nulls (lag)
    — the forward-fill shape sparse sensor/purchase columns need,
    without a self-join or a gap-fill explode. Both engines share the
    SQL-standard IGNORE NULLS semantics; deterministic tiebreak on
    event_id."""
    from json2hbase_spark.io import register_views

    register_views(spark, sf_dir, only=("events",))
    return spark.sql(
        """
        WITH e AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
          FROM events
        )
        SELECT user_id, event_id,
               last_value(purchase_value) IGNORE NULLS
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_purchase_value,
               lag(purchase_value, 1) IGNORE NULLS
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_purchase_value
        FROM e
        """
    )


@query(
    "h16_from_csv",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def h16_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-level CSV codec round trip: rows serialize to CSV
    strings with to_csv and parse back with from_csv (schema-checked,
    same expression family as from_json) — the embedded-delimited-
    payload shape (CSV inside a message envelope) without a file
    boundary. Aggregates over the re-parsed columns must equal
    aggregates over the originals; value survives via a decimal cast
    at serialization so float text formatting cannot drift."""
    ev = load(spark, sf_dir, "events")
    as_csv = ev.select(
        F.to_csv(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.col("value").cast("decimal(12,2)").alias("value"),
            )
        ).alias("line")
    )
    parsed = as_csv.select(
        F.from_csv(
            "line", "event_id BIGINT, event_type STRING, value DECIMAL(12,2)"
        ).alias("r")
    ).select("r.*")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
        F.sum("value").cast("double").alias("sum_value"),
    )


@query(
    "h17_fn_collation",
    oracle="""
    WITH k AS (
      SELECT lang,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN upper(lang)
               WHEN 1 THEN concat(upper(substr(lang, 1, 1)), substr(lang, 2))
               ELSE lang END AS variant
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT variant) AS n_variants,
           COUNT(DISTINCT lower(variant)) AS n_ci
    FROM k GROUP BY lang
    """,
)
def h17_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support: COUNT(DISTINCT x COLLATE UTF8_LCASE)
    collapses case variants AT THE COMPARISON LEVEL — no lower()
    normalization column, so the original strings survive and every
    downstream comparison inherits the collation. The mixed-case
    variants derive deterministically from doc_id so the DuckDB twin
    (which has no collations — it lowercases) must agree: 3 binary
    variants per language, 1 case-insensitive. At 100 TB collation
    beats normalize-and-duplicate: no second column, and the
    comparison runs inside codegen."""
    docs = load(spark, sf_dir, "documents")
    k = docs.select(
        "lang",
        F.expr(
            "CASE CAST(doc_id % 3 AS INT)"
            " WHEN 0 THEN upper(lang)"
            " WHEN 1 THEN concat(upper(substr(lang, 1, 1)), substr(lang, 2))"
            " ELSE lang END"
        ).alias("variant"),
    )
    return k.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("variant").alias("n_variants"),
        F.expr("COUNT(DISTINCT variant COLLATE UTF8_LCASE)").alias("n_ci"),
    )


# ---------------------------------------------------------------- e10

@query(
    "e10_win_time_range",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us FROM events
    ),
    burst AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS n_last_hour
      FROM e
    )
    SELECT user_id,
           CAST(MAX(n_last_hour) AS BIGINT) AS max_burst,
           COUNT(*) AS n_events
    FROM burst GROUP BY user_id
    """,
)
def e10_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-interval RANGE frame (the window surface e7's numeric
    range doesn't cover): per user, events inside the trailing hour of
    each event — the burst/rate-limit detector shape. Implemented as a
    value-range frame over unix_micros(ts) (identical to SQL's RANGE
    BETWEEN INTERVAL 1 HOUR PRECEDING: microsecond arithmetic, peers
    included), reduced to per-user max burst so the payload is
    user-sized. The window runs inside each user's partition — no
    global sort — and at 100 TB this partitions by user exactly like
    i15/i16; the frame bound is O(events-in-hour) per row, the
    streaming twin being i2's sliding window."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    burst = ev.select("user_id", F.count("*").over(w).alias("n_last_hour"))
    return burst.groupBy("user_id").agg(
        F.max("n_last_hour").cast("bigint").alias("max_burst"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------- g7

@query(
    "g7_union_by_name",
    oracle="""
    SELECT 'customer' AS src, c_custkey AS acct_key, c_acctbal AS acctbal,
           c_mktsegment AS mktsegment
    FROM customer
    UNION ALL
    SELECT 'supplier', s_suppkey, s_acctbal, NULL
    FROM supplier
    """,
)
def g7_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: two account sources with DIFFERENT
    column sets combined by NAME with missing columns null-filled
    (``unionByName(allowMissingColumns=True)``) — the lakehouse
    append pattern when upstream schemas drift (a11's evolution story
    at the set-operation level, vs g1's positional union of identical
    shapes). Catalyst resolves the alignment at plan time: the
    physical plan is a plain Union of two projections, zero runtime
    cost for the missing column."""
    cust = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("acct_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_suppkey").alias("acct_key"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@query(
    "e13_cumulative_uniques",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(CAST(ts AS DATE)) AS VARCHAR) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1
    ),
    new_per_day AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY 1
    )
    SELECT d.day, d.dau,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0))
                OVER (ORDER BY d.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_uniques
    FROM daily d LEFT JOIN new_per_day n ON n.day = d.day
    """,
)
def e13_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time — the growth curve every
    analytics stack draws, and the classic window trap: COUNT(DISTINCT)
    OVER a running frame is unsupported (and would be O(n²) state
    anyway). The scalable identity: a user contributes to the
    cumulative curve exactly once, on their FIRST day — so
    cumulative_uniques(d) = Σ new_users(day ≤ d), turning a running
    distinct into a per-user min + a daily count + a running SUM over
    |days| rows. Per day: DAU (exact distinct), first-time users, and
    the cumulative unique count.

    Plan: one user-keyed agg (min day — map-side combines), one
    day-keyed agg, then the running sum runs over the ~|days| daily
    rows — the whole-table window is over a BOUNDED aggregate (tens of
    rows per year), the f6/j77 'ordering is the semantics on a tiny
    table' category, not a data-sized funnel. At 100 TB the same
    shape holds: events never sort globally, only day-level rows do."""
    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date").cast("string")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily = ev.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    new_per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.join(new_per_day, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
        )
        .withColumn(
            "cumulative_uniques", F.sum("new_users").over(w).cast("bigint")
        )
    )
