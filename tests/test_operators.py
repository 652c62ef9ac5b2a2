"""Unit tests: rowkey derivation, hbase sink emulation, join/agg edge
cases on literal fixtures (FIXTURES.md §3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from json2hbase_spark.operators.flatten import kv_flatten
from json2hbase_spark.operators.hbase import (
    derive_rowkey,
    prepare_hbase_cells,
    write_hbase_emulated,
)


def test_derive_rowkey_composite_and_salt(spark):
    df = spark.createDataFrame([(1, "BUILDING")], "k INT, seg STRING")
    row = df.select(
        derive_rowkey("k", "seg").alias("plain"),
        derive_rowkey("k", "seg", salt_len=2).alias("salted"),
    ).first()
    assert row.plain == "1#BUILDING"
    assert row.salted.endswith("#1#BUILDING") and len(row.salted.split("#")[0]) == 2


def test_hbase_sink_sorted_within_regions(spark):
    df = spark.createDataFrame(
        [(f"k{i:03d}", {"a": i, "b": i * 2}) for i in range(100)],
        "id STRING, doc MAP<STRING, BIGINT>",
    )
    kv = kv_flatten(df, "id")
    with tempfile.TemporaryDirectory() as tmp:
        write_hbase_emulated(kv, tmp, n_regions=4)
        back = spark.read.parquet(tmp)
        assert back.count() == 200
    # HFile contract: within each partition, rows sorted by (rowkey, cf, qualifier)
    parts = prepare_hbase_cells(kv, 4).rdd.glom().collect()
    for part in parts:
        keys = [(r.rowkey, r.cf, r.qualifier) for r in part]
        assert keys == sorted(keys)


def test_join_null_semantics(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (None, "n")], "id INT, v STRING")
    right = spark.createDataFrame([(2, "x"), (3, "y"), (4, "z"), (None, "m")], "id INT, w STRING")
    inner = left.join(right, "id").count()
    assert inner == 2  # null never matches null
    full = left.join(right, "id", "full").count()
    assert full == 6  # 2 matched + 2 left-only (1, null) + 2 right-only (4, null)
    semi = left.join(right, "id", "left_semi").count()
    anti = left.join(right, "id", "left_anti").count()
    assert semi == 2 and anti == 2


def test_agg_null_vs_empty(spark):
    df = spark.createDataFrame(
        [("g1", None), ("g1", None), ("g2", 5.0)], "g STRING, x DOUBLE"
    )
    rows = {
        r.g: r
        for r in df.groupBy("g")
        .agg(F.sum("x").alias("s"), F.count("x").alias("cx"), F.count("*").alias("call"))
        .collect()
    }
    assert rows["g1"].s is None and rows["g1"].cx == 0 and rows["g1"].call == 2
    assert rows["g2"].s == 5.0
    # empty relation: global agg yields one row with null sum / zero count
    empty = df.filter(F.lit(False)).agg(F.sum("x").alias("s"), F.count("*").alias("n")).first()
    assert empty.s is None and empty.n == 0


def test_window_ties_rank_vs_dense_vs_rownumber(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("k", 10), ("k", 10), ("k", 20), ("k", 30), ("k", 30)], "k STRING, ord INT"
    )
    w = Window.partitionBy("k").orderBy("ord")
    out = df.select(
        "ord",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).collect()
    by_ord = sorted([(r.ord, r.rnk, r.drnk) for r in out])
    assert by_ord == [(10, 1, 1), (10, 1, 1), (20, 3, 2), (30, 4, 3), (30, 4, 3)]
    assert sorted(r.rn for r in out) == [1, 2, 3, 4, 5]


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert "d1_agg_hash" in qs and "a3_kv_flatten" in qs


def test_driver_window_orders_stalest_first():
    """The driver records only the first 50 queries() entries, so the
    ordering must put never-recorded queries first and rotate the
    verified remainder oldest-driver-record-first — each round then
    re-verifies the stalest ids instead of the same recent 50."""
    import __spark_entry__ as entrymod

    seen = entrymod._driver_verified()
    order = list(entrymod.queries())
    assert len(order) == len(set(order))
    fresh = [n for n in order if n not in seen]
    # every never-recorded query precedes every recorded one
    if fresh:
        last_fresh = max(order.index(n) for n in fresh)
        first_seen = min(order.index(n) for n in order if n in seen)
        assert last_fresh < first_seen
    # the recorded tail is non-decreasing in last-green round
    rounds = [seen[n] for n in order if n in seen]
    assert rounds == sorted(rounds)


def test_f4_sample_rate_close_to_nominal(spark):
    from json2hbase_spark.plans.relational_queries import f4_sample_det

    out = f4_sample_det(spark, "/root/testdata/sf0.001")
    n = out.count()
    assert 0.02 * 6000 < n < 0.09 * 6000  # 13/256 nominal, loose bounds
    # deterministic: same rows every run
    assert out.exceptAll(f4_sample_det(spark, "/root/testdata/sf0.001")).count() == 0


def test_i8_gapfill_covers_every_hour(spark):
    from json2hbase_spark.plans.streaming_queries import i8_resample_gapfill

    out = i8_resample_gapfill(spark, "/root/testdata/sf0.001").collect()
    hours = sorted({r.hour_us for r in out})
    diffs = {b - a for a, b in zip(hours, hours[1:])}
    assert diffs == {3_600_000_000}  # contiguous hourly grid, no gaps
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, 0)
        by_type[r.event_type] += 1
    assert len(set(by_type.values())) == 1  # every type has the full grid


def test_j19_mixture_rates(spark):
    from json2hbase_spark.plans.llm_queries import MIXTURE_RATES, j19_mixture_sample

    rows = {r.lang: r for r in j19_mixture_sample(spark, "/root/testdata/sf0.01").collect()}
    for lang, rate in MIXTURE_RATES.items():
        got = rows[lang].realized_rate
        assert abs(got - rate) < 0.15, (lang, got, rate)


def test_j20_components_group_transitive_dups(spark):
    from json2hbase_spark.plans.advanced_queries import j20_dup_components

    out = j20_dup_components(spark, "/root/testdata/sf0.01").collect()
    assert all(r.n_docs >= 2 for r in out)  # singletons never enter the graph
    assert all(r.component == r.min_doc for r in out)  # min-label convention


def test_c10_salted_join_equals_plain_join(spark):
    from json2hbase_spark.io import load
    from json2hbase_spark.plans.advanced_queries import c10_join_salted

    sf = "/root/testdata/sf0.001"
    salted = c10_join_salted(spark, sf)
    ev, cust = load(spark, sf, "events"), load(spark, sf, "customer")
    plain = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("user_id", "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").alias("sum_value"),
        )
    )
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed tables co-locate join keys at write time: the sort-merge
    join over two tables bucketed on the same key needs NO Exchange —
    the layout that makes repeated fact-fact joins affordable at scale."""
    from json2hbase_spark.io import load

    sf = "/root/testdata/sf0.001"
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist — clear them so saveAsTable can't
    # hit LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").format("parquet").saveAsTable("li_bucketed"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").format("parquet").saveAsTable("ord_bucketed"))
    # small fixtures would broadcast; disable it so the planner must
    # pick the bucketed sort-merge path (the join shape under test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == li.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_a9_partition_pruning(spark, tmp_path):
    """A lang filter over the partitioned layout must prune at the
    source (PartitionFilters), not post-scan."""
    from json2hbase_spark.plans.etl_queries import a9_partitioned_write

    sf = "/root/testdata/sf0.001"
    a9_partitioned_write(spark, sf)  # materializes the layout
    import os, tempfile
    path = os.path.join(tempfile.gettempdir(), "j2h_docs_by_lang_" + sf.strip("/").replace("/", "_"))
    en = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_e9_forward_fill_semantics(spark):
    """IGNORE NULLS last_value carries the previous non-null forward;
    lag IGNORE NULLS reaches past nulls to the prior observation."""
    rows = [
        (1, 1, None), (1, 2, 10.0), (1, 3, None), (1, 4, 20.0), (1, 5, None),
    ]
    df = spark.createDataFrame(rows, "u INT, seq INT, v DOUBLE")
    df.createOrReplaceTempView("e9t")
    out = {
        r.seq: (r.ff, r.prev)
        for r in spark.sql(
            """
            SELECT seq,
                   last_value(v) IGNORE NULLS OVER
                     (PARTITION BY u ORDER BY seq
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
                   lag(v, 1) IGNORE NULLS OVER (PARTITION BY u ORDER BY seq) AS prev
            FROM e9t
            """
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (10.0, None)
    assert out[3] == (10.0, 10.0)
    assert out[4] == (20.0, 10.0)
    assert out[5] == (20.0, 20.0)


def test_g5_recursion_depth_and_root(spark):
    """The 5-ary hierarchy walk: node 24 -> 4 (4 < 5 stops) gives
    depth 1, root 4; nodes < 5 are their own root at depth 0."""
    from json2hbase_spark import registry
    from json2hbase_spark.registry import QUERIES

    registry.load_all_query_modules()
    out = {r.n_nationkey: (r.depth, r.root)
           for r in QUERIES["g5_recursive_cte"](spark, "/root/testdata/sf0.001").collect()}
    assert out[24] == (1, 4)
    assert out[4] == (0, 4)
    assert out[7] == (1, 1)


def test_h14_theta_exact_at_small_cardinality(spark):
    """Theta sketches are EXACT below their nominal k (2^12): the
    set-algebra estimates equal the true counts on a small universe."""
    a = spark.range(0, 300).selectExpr("id AS x")
    b = spark.range(200, 500).selectExpr("id AS x")
    a.createOrReplaceTempView("ta"); b.createOrReplaceTempView("tb")
    r = spark.sql(
        """
        WITH sa AS (SELECT theta_sketch_agg(x) sk FROM ta),
             sb AS (SELECT theta_sketch_agg(x) sk FROM tb)
        SELECT theta_sketch_estimate(theta_intersection(sa.sk, sb.sk)) AS inter,
               theta_sketch_estimate(theta_union(sa.sk, sb.sk)) AS uni,
               theta_sketch_estimate(theta_difference(sa.sk, sb.sk)) AS diff
        FROM sa, sb
        """
    ).collect()[0]
    assert (r.inter, r.uni, r.diff) == (100, 500, 200)


def test_j36_quartiles_partition_docs(spark, sf_dir):
    """Quartile bucketing covers every scored doc exactly once and the
    top stratum keeps everything (rate 1.0)."""
    from json2hbase_spark import registry
    from json2hbase_spark.registry import QUERIES

    registry.load_all_query_modules()
    rows = QUERIES["j36_quality_mixture"](spark, sf_dir).collect()
    assert {r.quartile for r in rows} <= {1, 2, 3, 4}
    top = [r for r in rows if r.quartile == 4][0]
    assert top.n_sampled == top.n_docs
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_docs


def test_b12_scd2_collapses_and_versions(spark, tmp_path):
    """SCD2 semantics on a constructed change log: consecutive
    identical values collapse into one version, a re-appearing value
    opens a NEW version (type 2, not type 1), exactly one open
    version per key, and intervals chain [from, to) without gaps."""
    from json2hbase_spark import registry

    registry.load_all_query_modules()
    rows = [
        # custkey 1: A, A (collapse), B, A (re-open) on 4 dates
        (100, 1, "O", 10.0, "2024-01-01", "A"),
        (101, 1, "O", 10.0, "2024-02-01", "A"),
        (102, 1, "O", 10.0, "2024-03-01", "B"),
        (103, 1, "O", 10.0, "2024-04-01", "A"),
        # custkey 2: single order → one open version
        (104, 2, "O", 10.0, "2024-01-15", "C"),
    ]
    df = spark.createDataFrame(
        [(k, c, s, p, __import__("datetime").datetime.fromisoformat(d), pr)
         for k, c, s, p, d, pr in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "scd2fix")
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = sorted(
        registry.QUERIES["b12_scd2_build"](spark, d).collect(),
        key=lambda r: (r.custkey, r.version),
    )
    c1 = [r for r in out if r.custkey == 1]
    assert [(r.priority, r.eff_from, r.eff_to) for r in c1] == [
        ("A", "2024-01-01", "2024-03-01"),
        ("B", "2024-03-01", "2024-04-01"),
        ("A", "2024-04-01", None),
    ]
    assert [r.version for r in c1] == [1, 2, 3]
    assert [r.is_current for r in c1] == [False, False, True]
    c2 = [r for r in out if r.custkey == 2]
    assert len(c2) == 1 and c2[0].is_current and c2[0].eff_to is None


def test_b12_one_current_version_per_key(spark):
    """On the fixture: every customer has exactly one open version and
    version numbers are dense from 1."""
    from json2hbase_spark import registry

    registry.load_all_query_modules()
    out = registry.QUERIES["b12_scd2_build"](spark, "/root/testdata/sf0.001").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.custkey, []).append(r)
    for k, rs in by_key.items():
        assert sum(1 for r in rs if r.is_current) == 1, k
        assert sorted(r.version for r in rs) == list(range(1, len(rs) + 1)), k


def test_a26_gzip_files_and_lossless_text(spark, tmp_path):
    """The sink actually writes .gz parts, and the round-trip
    preserves full text bytes (hash compare, not just counts)."""
    import glob

    from pyspark.sql import functions as F

    from json2hbase_spark import registry
    from json2hbase_spark.io import load

    registry.load_all_query_modules()
    sf = "/root/testdata/sf0.001"
    registry.QUERIES["a26_jsonl_gzip"](spark, sf).collect()
    from json2hbase_spark.scratch import LAST_STAGED

    path = LAST_STAGED["a26_jsonl_gzip"]
    parts = glob.glob(f"{path}/part-*")
    assert parts and all(p.endswith(".json.gz") for p in parts)
    back = spark.read.json(path)
    want = load(spark, sf, "documents")
    h = lambda df: df.select(  # noqa: E731
        F.md5(F.concat_ws("|", "doc_id", "text", "lang", "source")).alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")).alias("s")).collect()[0].s
    assert h(back) == h(want)


def test_a27_failfast_throws_on_corrupt(spark, tmp_path):
    """The third parser policy: FAILFAST is the schema-contract gate —
    it must raise on the malformed line PERMISSIVE quarantines."""
    import pytest
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("1,ALGERIA,0\nnotakey,BROKEN\n2,BRAZIL,1\n")
    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("name", StringType()),
            StructField("r", IntegerType()),
        ]
    )
    ok = spark.read.csv(p, schema=schema, mode="PERMISSIVE")
    assert ok.count() == 3  # permissive keeps (nulled) malformed rows
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.csv(p, schema=schema, mode="FAILFAST").collect()


def test_c18_exactly_one_version_per_fact(spark):
    """The as-of join must match every order exactly once (intervals
    partition each customer's timeline): sum of n_orders equals the
    orders row count."""
    from json2hbase_spark import registry
    from json2hbase_spark.io import load

    registry.load_all_query_modules()
    sf = "/root/testdata/sf0.001"
    out = registry.QUERIES["c18_scd2_asof_join"](spark, sf).collect()
    assert sum(r.n_orders for r in out) == load(spark, sf, "orders").count()
    for r in out:
        assert 0 <= r.n_match <= r.n_orders


def test_j107_no_straddling_edges_and_split_covers_corpus(spark):
    """The cluster-safe split's defining guarantees: zero verified
    near-dup edges cross the split, the two sides partition the
    corpus, and the eval fraction is near the 26/256 hash cut."""
    from json2hbase_spark import registry
    from json2hbase_spark.io import load

    registry.load_all_query_modules()
    sf = "/root/testdata/sf0.01"
    rows = {r.split: r for r in registry.QUERIES["j107_cluster_safe_split"](spark, sf).collect()}
    assert set(rows) == {"train", "eval"}
    total = sum(r.n_docs for r in rows.values())
    assert total == load(spark, sf, "documents").count()
    for r in rows.values():
        assert r.n_straddling_edges == 0
        assert r.n_clustered >= 0 and r.n_groups <= r.n_docs
    frac = rows["eval"].n_docs / total
    assert 0.04 < frac < 0.20  # 26/256 ≈ 0.102, loose band


def test_i27_incremental_scd2_equals_one_shot(spark):
    """The streaming SCD2 maintenance must produce the EXACT history
    b12 builds in one shot (same versions, same validity intervals,
    same open rows), and must actually have run incrementally — three
    state versions on disk, one per staged micro-batch."""
    import glob
    import os

    from json2hbase_spark import registry
    from json2hbase_spark.scratch import LAST_STAGED

    registry.load_all_query_modules()
    sf = "/root/testdata/sf0.001"
    got = registry.QUERIES["i27_stream_scd2_maintain"](spark, sf)
    want = registry.QUERIES["b12_scd2_build"](spark, sf)
    key = lambda r: (r.custkey, r.version)  # noqa: E731
    got_rows = sorted(got.collect(), key=key)
    want_rows = sorted(want.collect(), key=key)
    assert [tuple(r) for r in got_rows] == [tuple(r) for r in want_rows]
    state_root = LAST_STAGED["i27_stream_scd2_maintain"]
    assert len(glob.glob(os.path.join(state_root, "v*"))) == 3
    # per-key sanity: exactly one open version, contiguous intervals
    by_key = {}
    for r in got_rows:
        by_key.setdefault(r.custkey, []).append(r)
    for vers in by_key.values():
        assert sum(1 for v in vers if v.is_current) == 1
        assert vers[-1].eff_to is None and vers[-1].is_current
        for a, b in zip(vers, vers[1:]):
            assert a.eff_to == b.eff_from
            assert b.version == a.version + 1


def test_load_table_stream_survives_fixture_regeneration(spark, tmp_path):
    """ADVICE r8: the deterministic stage dir persists across runs, so
    a regenerated fixture (new Spark part-file names each write; or a
    shape flip file↔directory) must not leave dangling or duplicate
    links behind — the stream must read exactly the CURRENT rows."""
    from json2hbase_spark.io import load_table_stream
    from json2hbase_spark.scratch import scratch_dir

    d = str(tmp_path / "regen")

    def write_docs(n, start=0):
        spark.createDataFrame(
            [(start + i, f"text {start + i}", "en", "s0", 10) for i in range(n)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).repartition(2).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    def read_all(tag):
        q = (
            load_table_stream(spark, d, "documents")
            .writeStream.format("memory")
            .queryName(tag)
            .outputMode("append")
            .option("checkpointLocation", scratch_dir(f"ckpt_{tag}_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.doc_id for r in spark.table(tag).collect()}

    write_docs(4)
    assert read_all("regen_a") == {0, 1, 2, 3}
    # regenerate: same logical table, brand-new part-file names
    write_docs(3, start=100)
    got = read_all("regen_b")
    assert got == {100, 101, 102}, f"stale stage links leaked rows: {got}"
