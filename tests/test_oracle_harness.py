"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` DuckDB twin at KUSS_TEST_SF_DIR
(default sf0.001 for speed; the driver uses sf0.01) and compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from ksql_udaf_statistics_spark.sources.tables import TABLE_NAMES


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "entry() returned an empty result"
    assert "skewness" in df.columns and "window_start" in df.columns


ORACLE_NAMES = sorted(entry_mod.oracle_sql())
ALL_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qdf = entry_mod.queries()[name](spark, sf_dir)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = duck.sql(entry_mod.oracle_sql()[name])
    duck_cols = [c for c in res.columns]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (len(spark_rows), len(duck_rows))
    assert _rowset(spark_cols, spark_rows) == _rowset(duck_cols, duck_rows)


# rows-only queries that legitimately return zero rows at test scale
# (none currently: the permanently-empty embedding_near_dups_lsh gate
# entry was retired in r4 in favor of its oracle-verified variant)
MAY_BE_EMPTY: set[str] = set()


@pytest.mark.parametrize("name", sorted(set(ALL_NAMES) - set(ORACLE_NAMES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    n = df.count()
    if name in MAY_BE_EMPTY:
        assert n >= 0
    else:
        assert n > 0, f"rows-only query {name} returned an empty result"
