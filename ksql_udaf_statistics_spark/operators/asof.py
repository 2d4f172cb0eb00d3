"""As-of join — an operator Spark lacks natively (pyspark guide: bucketize
or pandas merge_asof per group). Two implementations:

- :func:`asof_join` — cogrouped ``applyInPandas`` + ``pd.merge_asof``:
  each key's partitions meet once, the sorted merge runs at C speed, and
  the only shuffle is the standard cogroup-by-key exchange. **Memory
  bound**: each key's FULL history (left + right) must fit in one
  executor's Python worker — a skewed key (one user with 10^8 events)
  OOMs. Use for tall-skinny market-data / metrics shapes with bounded
  per-key history.
- :func:`asof_join_columns` — pure-Column fallback: union the two sides,
  sort within key by timestamp, carry the right values forward with
  ``last(ignorenulls)`` over a running window. Same single shuffle, but
  Spark's window sort *spills to disk* instead of OOMing, so it survives
  arbitrarily skewed keys. No Python in the row path. Prefer this when
  per-key history is unbounded.

Both are deterministic on timestamp ties: when several right rows share
one timestamp, the row that is lexicographically greatest on
``right_vals`` wins (documented tie rule, enforced by an explicit stable
sort on both paths).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward) for the same key.

    Output: all left columns + ``right_vals`` (null when no match).
    See module docstring for the per-key memory bound; use
    :func:`asof_join_columns` for skewed keys.
    """
    left_cols = left.columns
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields
    )
    right_schema = {f.name: f for f in right.schema.fields}
    out_fields += ", " + ", ".join(
        f"`{c}` {right_schema[c].dataType.simpleString()}" for c in right_vals
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=left_cols + list(right_vals))
        # kind="stable": pandas' default quicksort makes equal-ts row order
        # (hence the merge_asof match) depend on input order, which varies
        # with partitioning — flaky oracle rows.
        l = l.sort_values(left_ts, kind="stable")
        if len(r) == 0:
            for c in right_vals:
                l[c] = None
            return l[left_cols + list(right_vals)]
        # merge_asof picks the LAST right row among equal timestamps, so a
        # stable secondary sort on the value columns pins the tie winner.
        r = r.sort_values([right_ts, *right_vals], kind="stable")[
            [right_ts, *right_vals]
        ]
        m = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, direction=direction,
        )
        return m[left_cols + list(right_vals)]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), out_fields)
    )


def asof_join_columns(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
) -> DataFrame:
    """Backward as-of join as a composition of built-in operators.

    Union both sides tagged by origin, order within each key by
    (timestamp, is_left, right_vals) and carry the most recent right
    values forward with ``last(ignorenulls)`` over a running window.
    A right row at exactly the left row's timestamp matches (inclusive
    bound) because right rows sort before left rows at equal timestamps.

    Scale shape: one shuffle on the key (same as the cogroup path), but
    the per-key ordering is Spark's window sort, which spills — a key with
    10^8 rows degrades to disk instead of OOMing a Python worker. Entirely
    JVM-side; use for unbounded / skewed per-key histories.
    """
    left_cols = left.columns
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c) for c in right_vals],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    order = [F.col("_ts"), F.col("_is_left")] + [F.col(c) for c in right_vals]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left_cols,
        "_is_left",
        *[
            F.last(F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in right_vals
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *left_cols, *[F.col(f"_asof_{c}").alias(c) for c in right_vals]
    )
