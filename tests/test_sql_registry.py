"""SQL dispatch surface: registered grouped-agg UDFs return the reference
golden values through plain spark.sql — the SHOW FUNCTIONS parity check
(AllUdafIT.java:116-153)."""

import pytest
from pyspark.sql import Row

from ksql_udaf_statistics_spark.functions.sql_registry import register_sql_functions

GOLDEN = [3.0, 3.0, 4.0, 7.0, 7.0, 13.0, 16.0, 16.0, 16.0, 20.0]
WV = [(3.0, 2.0), (4.0, 1.0), (7.0, 2.0), (13.0, 1.0), (16.0, 3.0), (20.0, 1.0)]


def test_sql_registered_udafs(spark):
    names = register_sql_functions(spark)
    assert "stddev_weighted" in names and len(names) == 7
    spark.createDataFrame([Row(x=v) for v in GOLDEN]).createOrReplaceTempView("vals")
    spark.createDataFrame([Row(x=v, w=w) for v, w in WV]).createOrReplaceTempView("wvals")
    row = spark.sql(
        "SELECT skewness_stat(x) AS sk, kurtosis_stat(x) AS ku FROM vals"
    ).collect()[0]
    assert row["sk"] == pytest.approx(0.075718, abs=1e-4)
    assert row["ku"] == pytest.approx(1.4400, abs=1e-4)
    wrow = spark.sql(
        "SELECT stddev_weighted(x, w) AS sd, skewness_weighted(x, w) AS sk, "
        "kurtosis_weighted(x, w) AS ku FROM wvals"
    ).collect()[0]
    assert wrow["sd"] == pytest.approx(6.0539, abs=1e-4)
    assert wrow["sk"] == pytest.approx(0.075718, abs=1e-4)
    assert wrow["ku"] == pytest.approx(1.4400, abs=1e-4)
    # grouped dispatch
    n = spark.sql(
        "SELECT x > 5 AS grp, kurtosis_sample_stat(x) AS k FROM vals GROUP BY 1"
    ).count()
    assert n == 2


def test_reference_name_registration_guard(spark):
    """Registering under the reference's SQL names must fail loudly by
    default: a session-registered UDF SHADOWS the same-named Spark builtin
    (verified below), silently switching skewness/kurtosis semantics for
    the whole session. force=True opts in and must actually deliver the
    REFERENCE conventions under the reference names."""
    import warnings

    from ksql_udaf_statistics_spark.functions.sql_registry import (
        register_reference_names,
    )

    with pytest.raises(ValueError, match="skewness"):
        register_reference_names(spark)
    # isolate the shadowing in a sibling session: same SparkContext,
    # separate function registry — the shared fixture keeps its builtins
    s2 = spark.newSession()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        names = register_reference_names(s2, force=True)
    assert "skewness" in names and "kurtosis" in names
    assert any("builtin" in str(x.message) for x in w)
    # resolution check: SQL kurtosis must now be the reference's
    # population RAW form (golden 1.4400), not Spark's excess (-1.56)
    s2.createDataFrame(
        [Row(x=v) for v in GOLDEN]
    ).createOrReplaceTempView("guard_vals")
    k = s2.sql("SELECT kurtosis(x) AS k FROM guard_vals").collect()[0]["k"]
    assert k == pytest.approx(1.4400, abs=1e-4)
    # and the original session still resolves the Spark builtin (excess)
    spark.createDataFrame(
        [Row(x=v) for v in GOLDEN]
    ).createOrReplaceTempView("guard_vals_orig")
    k0 = spark.sql("SELECT kurtosis(x) AS k FROM guard_vals_orig").collect()[0]["k"]
    assert k0 < 0  # excess kurtosis of the golden multiset is negative
