"""Arrow-vectorized vs HOF token reductions: identical values, including
empty-array edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from ksql_udaf_statistics_spark.functions.token_ops import (
    with_token_stats_arrow,
    with_token_stats_hof,
)
from ksql_udaf_statistics_spark.sources.tables import synthesize_token_table


def test_arrow_equals_hof(spark):
    df = synthesize_token_table(spark, 500, seed=3).cache()
    a = {r["doc_id"]: r for r in with_token_stats_arrow(df).collect()}
    h = {r["doc_id"]: r for r in with_token_stats_hof(df).collect()}
    assert a.keys() == h.keys()
    for k in a:
        for c in ["token_mean", "token_var", "token_max", "token_min"]:
            assert a[k][c] == pytest.approx(h[k][c], abs=1e-9), (k, c)


def test_arrow_empty_and_single_arrays(spark):
    rows = [
        ("a", [], 0, "s", "2024-01-01 00:00:00"),
        ("b", [5], 1, "s", "2024-01-01 00:00:01"),
        ("c", [1, 2, 3], 3, "s", "2024-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, ts string"
    )
    out = {r["doc_id"]: r for r in with_token_stats_arrow(df).collect()}
    assert out["b"]["token_mean"] == 5.0 and out["b"]["token_var"] == 0.0
    assert out["c"]["token_mean"] == 2.0
    assert out["c"]["token_max"] == 3.0 and out["c"]["token_min"] == 1.0
    assert out["a"]["token_sum"] if "token_sum" in out["a"] else True
    assert out["a"]["token_mean"] == 0.0  # sum 0 / max(n,1)
    # empty array: NaN crosses the Arrow boundary as null, matching the
    # HOF path where array_max([]) is null
    assert out["a"]["token_max"] is None


def test_adjacent_token_pairs(spark):
    """BPE pair primitive: adjacency, single-token rows yield no pairs,
    and the plan stays free of interpreted lambda HOFs."""
    from pyspark.sql import functions as F

    from ksql_udaf_statistics_spark.functions.token_ops import adjacent_token_pairs

    df = spark.createDataFrame(
        [("a", [1, 2, 2, 3]), ("b", [7]), ("c", [5, 5])],
        "doc string, tokens array<int>",
    )
    rows = sorted(
        (r["doc"], r["tok_a"], r["tok_b"])
        for r in adjacent_token_pairs(df).collect()
    )
    assert rows == [("a", 1, 2), ("a", 2, 2), ("a", 2, 3), ("c", 5, 5)]
    plan = adjacent_token_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" not in plan.lower()
