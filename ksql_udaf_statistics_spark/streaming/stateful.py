"""Custom stateful operator: cumulative (unwindowed) statistics per key,
emitted on every update — the exact shape of the reference's continuous
CTAS ``SELECT 'singleton' AS id, SKEWNESS(val) ... GROUP BY id EMIT
CHANGES`` (AllUdafIT.java:593-600), where state lives forever and every
micro-batch emits the refreshed aggregate.

Implemented with ``applyInPandasWithState``: the explicit-state twin of
the sum-column decomposition. State is the accumulator tuple itself
(count, Σx..Σx⁴, Σw..Σwx⁴ — the reference's Struct,
KurtosisUdaf.java:48-54 / WeightedKurtosisUdaf.java:49-55); the update is
the vectorized kernel from stats.moments; emission applies the map()
formulas. Windowed jobs should keep using the implicit-state aggregation
(jobs.py) — this operator exists for aggregates with no window to expire,
where update-mode windows would be wrong and users want a running value.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..stats import moments as M

STATE_SCHEMA = StructType(
    [StructField("count", LongType())]
    + [StructField(f, DoubleType()) for f in
       ["s1", "s2", "s3", "s4", "sw", "swx", "swx2", "swx3", "swx4"]]
)


def _output_schema(keys: Sequence[str]) -> StructType:
    return StructType(
        [StructField(k, StringType()) for k in keys]
        + [
            StructField("n_rows", LongType()),
            StructField("skewness", DoubleType()),
            StructField("skewness_sample", DoubleType()),
            StructField("kurtosis", DoubleType()),
            StructField("kurtosis_sample", DoubleType()),
            StructField("stddev_weighted", DoubleType()),
            StructField("skewness_weighted", DoubleType()),
            StructField("kurtosis_weighted", DoubleType()),
        ]
    )


def cumulative_stats_with_state(
    df: DataFrame,
    value: str,
    weight: Optional[str] = None,
    keys: Sequence[str] = ("source",),
) -> DataFrame:
    """Running all-time statistics per key over a stream.

    Every micro-batch that touches a key emits that key's refreshed
    cumulative statistics (ksqlDB EMIT CHANGES semantics). State is the
    merge-able accumulator, so checkpoint resume continues exactly.
    """
    keys = list(keys)
    out_schema = _output_schema(keys)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            (count, s1, s2, s3, s4, sw, swx, swx2, swx3, swx4) = state.get
        else:
            count = 0
            s1 = s2 = s3 = s4 = sw = swx = swx2 = swx3 = swx4 = 0.0
        ms = M.MomentState(count, s1, s2, s3, s4)
        ws = M.WeightedState(sw, swx, swx2, swx3, swx4)
        for pdf in pdfs:
            vals = pdf[value].to_numpy()
            ms = ms.update(vals)
            if weight is not None:
                ws = ws.update(vals, pdf[weight].to_numpy())
        state.update((ms.count, ms.s1, ms.s2, ms.s3, ms.s4,
                      ws.sw, ws.swx, ws.swx2, ws.swx3, ws.swx4))
        row = dict(zip(keys, key))
        row.update(
            n_rows=ms.count,
            skewness=M.finalize_skewness(ms),
            skewness_sample=M.finalize_skewness(ms, sample=True),
            kurtosis=M.finalize_kurtosis(ms),
            kurtosis_sample=M.finalize_kurtosis(ms, sample=True),
            stddev_weighted=M.finalize_stddev_weighted(ws),
            skewness_weighted=M.finalize_skewness_weighted(ws),
            kurtosis_weighted=M.finalize_kurtosis_weighted(ws),
        )
        yield pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


PACKING_STATE = StructType([StructField("cum_tokens", LongType())])


def _packing_schema() -> StructType:
    return StructType([
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("n_tok", LongType()),
        StructField("start_tok", LongType()),
        StructField("first_seq", LongType()),
        StructField("last_seq", LongType()),
    ])


def streaming_sequence_packing(
    df: DataFrame,
    seq_len: int = 2048,
    part_col: str = "source",
    order_cols: Sequence[str] = ("ts", "doc_id"),
) -> DataFrame:
    """ONLINE concat-and-chunk sequence packing: as documents stream in,
    each is assigned its exact placement in the fixed-length training
    layout (start offset, first/last chunk id) — the streaming twin of
    ``functions.token_ops.sequence_packing``, byte-identical on a
    drained corpus when arrival order matches ``order_cols``.

    State per ``part_col`` key is ONE long (the cumulative token count),
    so state size is bounded by the number of sources — no timeout
    needed. Within a micro-batch the group's rows are ordered by
    ``order_cols`` before placement, so replays of a batch from the same
    state are deterministic (exactly-once through the usual sink)."""
    import pandas as pd

    out_schema = _packing_schema()
    order = list(order_cols)

    def update(key, pdfs, state: GroupState):
        cum = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(order)
        n = rows["n_tok"].to_numpy("int64")
        starts = cum + n.cumsum() - n
        cum = int(cum + n.sum())
        state.update((cum,))
        yield pd.DataFrame({
            "doc_id": rows["doc_id"].astype(str),
            "source": [key[0]] * len(rows),
            "n_tok": n,
            "start_tok": starts,
            "first_seq": starts // seq_len,
            "last_seq": (starts + n - 1) // seq_len,
        })

    return df.groupBy(part_col).applyInPandasWithState(
        update, out_schema, PACKING_STATE, "append", GroupStateTimeout.NoTimeout
    )
