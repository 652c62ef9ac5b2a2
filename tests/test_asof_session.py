"""Unit tests for the as-of join rewrite and sessionization
(FIXTURES.md §3 fixtures; SURVEY.md §2 C7/I3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from json2hbase_spark.operators.asof import asof_join
from json2hbase_spark.operators.sessionize import sessionize


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_asof_basic_and_exact_match(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p10"), (1, _ts(20), "p20"), (2, _ts(5), "q5")],
        "uid INT, ts TIMESTAMP, pid STRING",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(15), 150), (2, _ts(6), 600)],
        "uid INT, ts TIMESTAMP, payload INT",
    )
    out = {
        r.pid: (r.payload, r.matched_ts)
        for r in asof_join(left, right, ["uid"], "ts", "ts").collect()
    }
    assert out["p10"] == (100, _ts(10))  # exact-ts right row IS visible
    assert out["p20"] == (150, _ts(15))  # latest at-or-before
    assert out["q5"] == (None, None)  # right row is after: no match

    strict = {
        r.pid: r.payload
        for r in asof_join(
            left, right, ["uid"], "ts", "ts", allow_exact_matches=False
        ).collect()
    }
    assert strict["p10"] is None  # strictly-before excludes the ts=10 click
    assert strict["p20"] == 150


def test_asof_name_collision_prefix(spark):
    left = spark.createDataFrame([(1, _ts(10), 1.0)], "uid INT, ts TIMESTAMP, value DOUBLE")
    right = spark.createDataFrame([(1, _ts(5), 2.0)], "uid INT, ts TIMESTAMP, value DOUBLE")
    out = asof_join(left, right, ["uid"], "ts", "ts")
    assert "r_value" in out.columns and "value" in out.columns
    row = out.first()
    assert row.value == 1.0 and row.r_value == 2.0


def test_sessionize_gap_fixture(spark):
    # gaps: [5m, 40m, 10m, 2h] around a 30m threshold -> 3 sessions
    minutes = [0, 5, 45, 55, 175]
    df = spark.createDataFrame(
        [(1, _ts(m), i) for i, m in enumerate(minutes)], "uid INT, ts TIMESTAMP, eid INT"
    )
    out = sessionize(df, "uid", "ts", gap_seconds=30 * 60, tiebreak="eid")
    sessions = [r.session_id for r in out.orderBy("ts").collect()]
    assert sessions == [1, 1, 2, 2, 3]


def test_sessionize_order_invariance(spark):
    minutes = [0, 5, 45, 55, 175]
    rows = [(1, _ts(m), i) for i, m in enumerate(minutes)]
    fwd = sessionize(
        spark.createDataFrame(rows, "uid INT, ts TIMESTAMP, eid INT"), "uid", "ts", 1800, "eid"
    )
    rev = sessionize(
        spark.createDataFrame(rows[::-1], "uid INT, ts TIMESTAMP, eid INT"),
        "uid",
        "ts",
        1800,
        "eid",
    )
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))


def test_session_window_stream_equals_batch(spark, sf_dir):
    """F.session_window (the streaming-native operator) must agree with
    the batch lag+cumsum algorithm on session counts."""
    from json2hbase_spark.io import load

    ev = load(spark, sf_dir, "events")
    batch = (
        sessionize(ev, "user_id", "ts", 12 * 3600, "event_id")
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    native = (
        ev.groupBy(F.session_window("ts", "12 hours"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, native.collect()))


def test_tumbling_window_stream_equals_batch(spark, sf_dir):
    """SURVEY §5 item 6: the same windowed-agg plan run as a real
    micro-batch stream (availableNow → memory sink) must equal the
    batch execution row-for-row."""
    from pyspark.sql import functions as F

    from json2hbase_spark.plans.streaming_queries import i1_win_tumbling
    from json2hbase_spark.io import load_events_stream
    import tempfile

    batch = {
        (r.win_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in i1_win_tumbling(spark, sf_dir).collect()
    }

    stream = load_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("i1_equality_mem")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_i1_eq_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.win_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("i1_equality_mem").collect()
    }
    assert streamed == batch
