"""Per-row token-array reductions: the two implementations and when to use
each.

The engine constantly needs per-sequence scalars (token mean/var/max…)
from ``tokens:array<int32>``. Two paths:

- **HOF path** (``with_token_stats_hof``): pure Column algebra with
  ``F.aggregate``/``F.transform``. Zero Python, exact, works in any
  context — but Catalyst evaluates higher-order-function lambdas
  INTERPRETED (they never enter whole-stage codegen): measured ~200ns per
  array element, i.e. ~60µs/row at 260 tokens. Fine for small/medium
  jobs; the bottleneck at 10^9+ rows.
- **Arrow path** (``with_token_stats_arrow``): a scalar pandas UDF that
  flattens the Arrow list column once and reduces with
  ``np.add.reduceat``/``np.maximum.reduceat`` — one Python hop per batch,
  all-C per-element work (~2µs/row incl. Arrow transfer). This is the
  "vectorized pandas/Arrow UDFs (no per-row Python)" path the input_hint
  mandates, and the one the bench and large-scale jobs use.

Both produce identical values (tests/test_token_ops.py asserts it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TOKEN_STATS_SCHEMA = (
    "token_sum double, token_sumsq double, token_max double, token_min double"
)


_ARROW_UDF = None


def _token_stats_kernel(tokens: pd.Series) -> pd.DataFrame:
    """Vectorized per-row reductions over a list<int> column.

    ``tokens`` arrives as a Series of numpy arrays. One concatenate +
    reduceat pass computes all rows' sums without any per-row Python
    arithmetic.
    """
    n = len(tokens)
    if n == 0:
        return pd.DataFrame(
            {"token_sum": [], "token_sumsq": [], "token_max": [], "token_min": []}
        )
    lengths = np.fromiter((len(a) for a in tokens), dtype=np.int64, count=n)
    flat = np.concatenate([np.asarray(a, dtype=np.float64) for a in tokens]) \
        if lengths.sum() else np.zeros(0)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    nonempty = lengths > 0
    sums = np.zeros(n)
    sumsq = np.zeros(n)
    mx = np.full(n, np.nan)
    mn = np.full(n, np.nan)
    if flat.size:
        # reduceat misbehaves on zero-length segments; mask them out
        s_all = np.add.reduceat(flat, starts[nonempty]) if nonempty.any() else None
        q_all = np.add.reduceat(flat * flat, starts[nonempty]) if nonempty.any() else None
        mx_all = np.maximum.reduceat(flat, starts[nonempty])
        mn_all = np.minimum.reduceat(flat, starts[nonempty])
        # reduceat with consecutive equal indices (empty segment) never
        # happens here because we filtered to nonempty segments; but a
        # trailing empty segment after the last nonempty one is also
        # impossible by construction
        sums[nonempty] = s_all
        sumsq[nonempty] = q_all
        mx[nonempty] = mx_all
        mn[nonempty] = mn_all
    return pd.DataFrame(
        {"token_sum": sums, "token_sumsq": sumsq, "token_max": mx, "token_min": mn}
    )


def _finish(df: DataFrame, stats_col) -> DataFrame:
    n = F.greatest(F.col("n_tok").cast("double"), F.lit(1.0))
    mean = stats_col["token_sum"] / n
    return (
        df.withColumn("token_mean", mean)
        .withColumn("token_var", stats_col["token_sumsq"] / n - mean * mean)
        .withColumn("token_max", stats_col["token_max"])
        .withColumn("token_min", stats_col["token_min"])
    )


def _token_stats_arrow():
    # built lazily: pandas_udf schema parsing needs an active SparkSession
    global _ARROW_UDF
    if _ARROW_UDF is None:
        _ARROW_UDF = pandas_udf(TOKEN_STATS_SCHEMA)(_token_stats_kernel)
    return _ARROW_UDF


def with_token_stats_arrow(df: DataFrame) -> DataFrame:
    """Append token_mean/token_var/token_max/token_min via the Arrow path."""
    st = _token_stats_arrow()(F.col("tokens")).alias("_ts")
    tmp = df.withColumn("_ts", st)
    out = _finish(tmp, F.col("_ts"))
    return out.drop("_ts")


def adjacent_token_pairs(df: DataFrame, tokens_col: str = "tokens",
                         keep: list[str] | None = None) -> DataFrame:
    """Explode each sequence into its adjacent token pairs
    (tok_a, tok_b) — the counting primitive of BPE/WordPiece tokenizer
    training (merge candidates = most frequent adjacent pairs).

    Built entirely from codegen-friendly builtins (``slice`` +
    ``arrays_zip`` + ``explode``) — no lambda higher-order functions
    (interpreted, ~200ns/element) and no Python. At 100 TB this is a
    map-side-only fan-out: the pair rows collapse in the partial
    aggregation of whatever count/top-k follows, so the shuffle carries
    (group, pair, partial_count) rows, never the exploded stream.
    """
    t = F.col(tokens_col)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(t, 1, n1).alias("a"), F.slice(t, 2, n1).alias("b")
    )
    cols = list(keep or [c for c in df.columns if c != tokens_col])
    return (
        df.select(*cols, F.explode(zipped).alias("_p"))
        .select(*cols, F.col("_p.a").alias("tok_a"), F.col("_p.b").alias("tok_b"))
    )


def with_token_stats_hof(df: DataFrame) -> DataFrame:
    """Same columns via pure Column algebra (no Python at all)."""
    tokd = F.transform("tokens", lambda x: x.cast("double"))
    s1 = F.aggregate(tokd, F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(tokd, F.lit(0.0), lambda a, x: a + x * x)
    n = F.greatest(F.col("n_tok").cast("double"), F.lit(1.0))
    return (
        df.withColumn("token_mean", s1 / n)
        .withColumn("token_var", s2 / n - (s1 / n) * (s1 / n))
        .withColumn("token_max", F.array_max(tokd))
        .withColumn("token_min", F.array_min(tokd))
    )


def sequence_packing(
    df: DataFrame,
    seq_len: int = 2048,
    order_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): documents are concatenated in ``order_col`` order within
    each ``part_col`` partition and chunked into fixed ``seq_len``-token
    training sequences. Returns one row per document with its byte-exact
    placement: ``start_tok`` (exclusive prefix sum of n_tok),
    ``first_seq``/``last_seq`` (chunk ids) and ``spans_boundary``.

    Scale shape: the prefix sum is a window per ``part_col`` — parallel
    across partitions (sources/domains, the realistic packing unit:
    pipelines pack within a domain so mixing weights stay adjustable),
    skew-bounded by the largest one. A GLOBAL packing order at 100 TB
    uses the classic two-pass distributed prefix sum instead (per-file
    partial sums -> driver carries ~num_files offsets -> per-row cumsum
    + offset); the per-document arithmetic below is identical.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.col("n_tok").cast("long")).over(w), F.lit(0))
    first_seq = F.floor(F.col("start_tok") / seq_len)
    last_seq = F.floor((F.col("start_tok") + F.col("n_tok") - 1) / seq_len)
    return (
        df.withColumn("start_tok", start)
        .withColumn("first_seq", first_seq)
        .withColumn("last_seq", last_seq)
        .withColumn("spans_boundary", F.col("last_seq") > F.col("first_seq"))
    )


def sequence_packing_global(
    df: DataFrame,
    seq_len: int = 2048,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """GLOBAL-ORDER concat-and-chunk packing via the classic two-pass
    distributed prefix sum — the 100 TB shape a single global window
    cannot take (``Window.orderBy`` with no partition key collapses the
    whole table into ONE task).

    Pass shape:
    1. range-partition + sort by ``order_col`` (one shuffle; at scale
       this is usually free because the corpus is already laid out in
       ingest order);
    2. per-partition token sums — ``num_partitions`` rows to the driver
       (KBs even at 100k partitions);
    3. exclusive prefix offsets computed on the driver, broadcast back,
       and added to an Arrow ``mapInPandas`` running cumsum that never
       crosses partitions.

    Output: input rows + (start_tok, first_seq, last_seq,
    spans_boundary), byte-identical to a single-task global window (the
    DuckDB oracle computes exactly that)."""
    import pandas as pd

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Hard barrier: materialize the ranged layout exactly ONCE. A
    # persist() here leaked cache for the session (never unpersisted) and
    # — worse — on eviction the cumsum pass would silently re-execute
    # repartitionByRange, which is only guaranteed to reproduce the
    # layout the driver-side offsets were computed from when the input is
    # deterministic. localCheckpoint cuts the lineage (no recompute path
    # exists), and its blocks are freed by the ContextCleaner when this
    # DataFrame is garbage-collected rather than pinned until session end.
    ranged = ranged.localCheckpoint(eager=True)
    part_sums = {
        int(r["_pid"]): int(r["s"])
        for r in ranged.groupBy("_pid")
        .agg(F.sum(F.col("n_tok").cast("long")).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in range(max(part_sums, default=-1) + 1):
        offsets[pid] = acc
        acc += part_sums.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_fields = df.schema.fields
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + ", start_tok long, first_seq long, last_seq long, "
        "spans_boundary boolean"
    )
    cols = [f.name for f in out_fields]

    def place(it):
        running = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if running is None:
                running = b_offsets.value.get(int(pdf["_pid"].iat[0]), 0)
            nt = pdf["n_tok"].to_numpy("int64")
            starts = running + nt.cumsum() - nt
            running = int(running + nt.sum())
            out = pdf[cols].copy()
            out["start_tok"] = starts
            out["first_seq"] = starts // seq_len
            out["last_seq"] = (starts + nt - 1) // seq_len
            out["spans_boundary"] = out["last_seq"] > out["first_seq"]
            yield out

    result = ranged.mapInPandas(place, out_schema)
    return result
