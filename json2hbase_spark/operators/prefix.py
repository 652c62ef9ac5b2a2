"""Distributed ordered prefix sums — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (which moves the whole
table into a single task: Spark's WindowExec warns "Moving all data to
a single partition").

Classic two-pass shape:

1. bucket every row by a **monotone** function of the global order key
   (bucket boundaries can never split the order, so bucket-local order
   concatenated in bucket order IS the global order);
2. partition-local cumsum per bucket — ONE hash exchange on the bucket
   key, buckets run in parallel;
3. per-bucket totals (tiny: one row per bucket, map-side combined);
4. each bucket's offset = sum of all EARLIER buckets' totals, via a
   broadcast theta self-join of the totals table (≤ buckets² rows —
   trivial — and avoids re-introducing a single-partition window);
5. global cumsum = local cumsum + broadcast offset.

Output values are EXACTLY the global ordered cumsum — bucketing is an
execution detail invisible in the result, so a DuckDB oracle written
as a plain ``SUM(...) OVER (ORDER BY ...)`` still hash-matches.

At 100 TB: the only data-sized exchange is hashpartitioning(bucket) on
narrow metadata; parallelism = bucket count (``CUMSUM_BUCKETS``, a
dial — raise it with the cluster; at 256+ use a longer hex prefix in
``hex_prefix_bucket``); no ``Exchange SinglePartition`` anywhere in
the plan (tools/plan_audit.py tripwires that marker).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Parallelism of the cumsum exchange. Fixture-friendly default; a real
# deployment sets this to O(cluster cores), up to 65536 with the
# 4-hex-char prefix below.
CUMSUM_BUCKETS = 32


def hex_prefix_bucket(col: Column, n_buckets: int = CUMSUM_BUCKETS) -> Column:
    """Monotone bucket id for a LOWERCASE hex string key (md5/sha):
    hex digits 0-9a-f sort identically as characters and as values, so
    the numeric value of the first four chars is monotone in the full
    string's lexicographic order — and uniform for a hash key, so the
    buckets are balanced by construction. ``(prefix · n) div 65536``
    keeps monotonicity for any n_buckets ≤ 65536 (and for any n that
    divides 256 it assigns the identical buckets a 2-char prefix
    would, so widening the prefix was not a behavior change at the
    default)."""
    if not 1 <= n_buckets <= 65536:
        raise ValueError(f"n_buckets must be in [1, 65536], got {n_buckets}")
    pre = F.conv(F.substring(col, 1, 4), 16, 10).cast("long")
    return ((pre * n_buckets) / F.lit(65536)).cast("long")


def bucketed_cumsum(
    df: DataFrame,
    bucket: str,
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Global ordered running sum of ``value_col`` along
    ``order_cols``, computed without a single-partition window.
    ``df[bucket]`` must be an integer column MONOTONE NON-DECREASING
    along the global order of ``order_cols`` (hex_prefix_bucket for
    hash-string keys; ``(id · n) div (max+1)`` for dense integer
    keys). Returns df + ``out_col`` = inclusive prefix sum."""
    w_local = (
        Window.partitionBy(bucket)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_local_c", F.sum(value_col).over(w_local))
    totals = df.groupBy(bucket).agg(F.sum(value_col).alias("_btot"))
    a, b = totals.alias("_a"), totals.alias("_b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"_b.{bucket}") < F.col(f"_a.{bucket}"), "left")
        .groupBy(F.col(f"_a.{bucket}").alias(bucket))
        .agg(F.coalesce(F.sum("_b._btot"), F.lit(0).cast("long")).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), bucket)
        .withColumn(out_col, F.col("_local_c") + F.col("_off"))
        .drop("_local_c", "_off")
    )


def grouped_bucketed_cumsum(
    df: DataFrame,
    groups: list[str],
    bucket: str,
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Per-group ordered running sum of ``value_col`` along
    ``order_cols`` WITHIN each group, without a per-group
    single-partition window. Same two-pass shape as
    :func:`bucketed_cumsum`, but the offset join is constrained to the
    group: each (group, bucket) cell's offset = sum of the SAME
    group's earlier buckets only.

    When to use which: a plain ``Window.partitionBy(*groups)`` is
    already scale-safe when group cardinality is high (domains, users
    — each partition is small). This variant exists for the opposite
    regime: FEW, LARGE groups (data sources, mixture components,
    quality tiers), where one group would otherwise be one task. The
    totals table is |groups|·buckets rows — broadcast by construction
    in that regime. ``df[bucket]`` must be monotone non-decreasing
    along ``order_cols`` within every group."""
    w_local = (
        Window.partitionBy(*groups, bucket)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_local_c", F.sum(value_col).over(w_local))
    totals = df.groupBy(*groups, bucket).agg(F.sum(value_col).alias("_btot"))
    a, b = totals.alias("_a"), totals.alias("_b")
    cond = F.col(f"_b.{bucket}") < F.col(f"_a.{bucket}")
    for g in groups:
        cond = cond & (F.col(f"_b.{g}") == F.col(f"_a.{g}"))
    offsets = (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(
            *[F.col(f"_a.{g}").alias(g) for g in groups],
            F.col(f"_a.{bucket}").alias(bucket),
        )
        .agg(F.coalesce(F.sum("_b._btot"), F.lit(0).cast("long")).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), [*groups, bucket])
        .withColumn(out_col, F.col("_local_c") + F.col("_off"))
        .drop("_local_c", "_off")
    )


def bucketed_cumsum_multi(
    df: DataFrame,
    bucket: str,
    order_cols: list[str],
    sums: list[tuple[str, str]],
) -> DataFrame:
    """Several global ordered running sums in ONE two-pass pipeline —
    ``sums`` is a list of (value_col, out_col). Identical values to
    chaining :func:`bucketed_cumsum` per column, at a fraction of the
    plan: the N local window sums share a single WindowExec (same
    partition/order spec), the per-bucket totals collapse into one
    hash agg, and ONE broadcast offsets join carries all N offsets —
    versus N windows, N total aggs and N offset joins when chained
    (the j106/j109 shared curve paid that twice per round; VERDICT
    r10 flagged the exchange count)."""
    w_local = (
        Window.partitionBy(bucket)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df
    for i, (v, _) in enumerate(sums):
        local = local.withColumn(f"_lc{i}", F.sum(v).over(w_local))
    totals = df.groupBy(bucket).agg(
        *[F.sum(v).alias(f"_bt{i}") for i, (v, _) in enumerate(sums)]
    )
    a, b = totals.alias("_a"), totals.alias("_b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"_b.{bucket}") < F.col(f"_a.{bucket}"), "left")
        .groupBy(F.col(f"_a.{bucket}").alias(bucket))
        .agg(
            *[
                F.coalesce(F.sum(f"_b._bt{i}"), F.lit(0).cast("long")).alias(
                    f"_off{i}"
                )
                for i in range(len(sums))
            ]
        )
    )
    out = local.join(F.broadcast(offsets), bucket)
    for i, (_, o) in enumerate(sums):
        out = out.withColumn(o, F.col(f"_lc{i}") + F.col(f"_off{i}"))
    return out.drop(
        *[f"_lc{i}" for i in range(len(sums))],
        *[f"_off{i}" for i in range(len(sums))],
    )
