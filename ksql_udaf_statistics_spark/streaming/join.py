"""Stateful stream-stream join (engine-scope per north_rule; the reference
itself has no joins — SURVEY.md §2.2 "not present" list).

Shape: token stream ⋈ per-source control/reference stream on the group key
within an event-time bound. Both sides carry watermarks so Spark can evict
join state; the time-range predicate bounds how long a row waits for a
match — the canonical Structured Streaming interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "source",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark_left: str = "10 minutes",
    watermark_right: str = "10 minutes",
    lower: str = "5 minutes",
    upper: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """left ⋈ right ON key AND r_ts ∈ [l_ts - lower, l_ts + upper].

    The right side's key column is deduplicated out of the result. Works on
    batch DataFrames too (watermarks are no-ops there), so the oracle
    harness can validate the same join semantics in batch mode.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark_left)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark_right)
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"interval {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"interval {upper}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{on}"))
