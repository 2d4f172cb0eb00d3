"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (windowed token-sequence
statistics — the engine's core shape) on /root/testdata/sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-pipeline operators, each paired with an
ANSI-SQL DuckDB oracle where SQL-expressible (hash-based LSH ops are
rows-only by nature — their correctness is pytest-verified instead,
tests/test_operators.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ksql_udaf_statistics_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tumbling-window per-(source, window) moment statistics
    over a token-sequence view of the documents table (value=token_mean,
    weight=n_tok) — the reference's continuous-query shape (SURVEY.md §3)
    in batch form on /root/testdata/sf0.001."""
    from pyspark.sql import functions as F

    from ksql_udaf_statistics_spark.sources.tables import (
        token_value_streams, tokens_from_documents,
    )
    from ksql_udaf_statistics_spark.streaming.jobs import windowed_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # token_mean via the Arrow reduction kernel (token_value_streams), not
    # an interpreted F.aggregate HOF — the no-per-row-Python hot path
    tok = token_value_streams(
        tokens_from_documents(docs).withColumn(
            "ts",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.col("doc_id").cast("long") * 7
            ),
        )
    )
    return windowed_stats(
        tok, value="token_mean", weight="n_tok",
        keys=("source",), window_size="10 minutes",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
