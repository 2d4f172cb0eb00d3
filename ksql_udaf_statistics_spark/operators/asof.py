"""As-of join — an operator Spark lacks natively (pyspark guide: bucketize
or pandas merge_asof per group). Implemented with cogrouped
``applyInPandas`` + ``pd.merge_asof``: each key's partitions meet once,
sorted merge runs at C speed, and the only shuffle is the standard
cogroup-by-key exchange — the right call when each key's history fits an
executor (tall-skinny market-data / metrics shape).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


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
        l = l.sort_values(left_ts)
        if len(r) == 0:
            for c in right_vals:
                l[c] = None
            return l[left_cols + list(right_vals)]
        r = r.sort_values(right_ts)[[right_ts, *right_vals]]
        m = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, direction=direction,
        )
        return m[left_cols + list(right_vals)]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), out_fields)
    )
