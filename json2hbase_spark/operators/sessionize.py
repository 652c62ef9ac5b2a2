"""i3_win_session — gap-based sessionization (SURVEY.md §2 I3).

Batch algorithm (also the oracle-checkable form): per user, order by
(ts, id); a row starts a new session when the gap to the previous row
exceeds the threshold; session id = running sum of start flags. One
shuffle on the user key, two window passes — order-invariant w.r.t.
input partitioning (property-tested).

The streaming form (``F.session_window``) expresses the same semantics
incrementally with watermark-based state eviction; both are exposed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user) to each row."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wsum))


def session_window_stream(stream: DataFrame, user_col: str, ts_col: str, gap: str) -> Column:
    """Streaming-native session window expression for the same gap
    semantics (use inside groupBy with a watermark on ``ts_col``)."""
    return F.session_window(F.col(ts_col), gap)
