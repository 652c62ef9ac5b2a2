"""c7_join_asof — as-of (latest-at-or-before) join (SURVEY.md §2 C7).

Spark has no native ASOF JOIN. A range join (``l.ts >= r.ts`` +
row_number) explodes to O(|L|·|R|) pairs per key before pruning, which
is unusable at 100 TB. This operator uses the union-tag rewrite:

1. union left (tag 1) and right (tag 0) rows on the shared key space
2. one shuffle: window partitioned by key, ordered by (ts, tag)
3. ``last(right_payload, ignorenulls)`` over an unbounded-preceding
   frame carries the most recent right row forward
4. keep only left rows

Cost: a single hash shuffle + per-partition sort of |L|+|R| rows —
the same complexity as a sort-merge join, with no pair explosion.
Equal timestamps: tag 0 sorts before tag 1, so a right row at exactly
the left timestamp IS visible (``allow_exact_matches=True``), matching
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``; pass False for strict
``>``. Right rows must be unique per (key, ts) — pre-aggregate if not,
or the carried row is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right_ts <= left_ts`` (or ``<`` if not allow_exact_matches) for
    the same ``on`` keys. Right payload columns come back nullable,
    prefixed ``r_`` only if they collide with left names."""
    lpay = [c for c in left.columns if c not in on and c != left_ts]
    rpay = [c for c in right.columns if c not in on and c != right_ts]
    rename = {c: (f"r_{c}" if c in left.columns else c) for c in rpay}

    l_struct = F.struct(*[F.col(c) for c in lpay]).alias("_lrow")
    r_struct = F.struct(
        *[F.col(c).alias(rename[c]) for c in rpay], F.col(right_ts).alias("_matched_ts")
    ).alias("_rrow")

    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0 if allow_exact_matches else 2).alias("_tag"),
        r_struct,
    )
    rrow_type = r_tagged.schema["_rrow"].dataType.simpleString()
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.expr(f"CAST(NULL AS {rrow_type})").alias("_rrow"),
        l_struct,
    )
    lrow_type = l_tagged.schema["_lrow"].dataType.simpleString()
    r_tagged = r_tagged.withColumn("_lrow", F.expr(f"CAST(NULL AS {lrow_type})"))

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
    out_cols = (
        [F.col(c) for c in on]
        + [F.col("_ts").alias(left_ts)]
        + [F.col(f"_lrow.{c}").alias(c) for c in lpay]
        + [F.col(f"_match.{rename[c]}").alias(rename[c]) for c in rpay]
        + [F.col("_match._matched_ts").alias("matched_ts")]
    )
    return carried.filter(F.col("_tag") == 1).select(*out_cols)
