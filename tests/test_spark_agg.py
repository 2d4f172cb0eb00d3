"""DataFrame-level tests for the sum-decomposed aggregate surface.

Asserts: golden values (same vectors as the reference ITs), one-shot vs
two-stage equivalence (proving the Spark partial/final merge == the
reference's ``merge``), cross-checks against Spark built-ins with the
documented convention adjustments, shift-invariance of the ``center``
pivot, and NaN edge cases.
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ksql_udaf_statistics_spark.stats import spark_agg as SA

TOL = 1e-4

GOLDEN = [3.0, 3.0, 4.0, 7.0, 7.0, 13.0, 16.0, 16.0, 16.0, 20.0]
WV = [(3.0, 2.0), (4.0, 1.0), (7.0, 2.0), (13.0, 1.0), (16.0, 3.0), (20.0, 1.0)]


@pytest.fixture(scope="module")
def golden_df(spark):
    return spark.createDataFrame([Row(x=v) for v in GOLDEN]).repartition(4)


@pytest.fixture(scope="module")
def weighted_df(spark):
    return spark.createDataFrame([Row(x=v, w=w) for v, w in WV]).repartition(3)


def one(df, col):
    return df.agg(col.alias("r")).collect()[0]["r"]


def test_golden_values_one_shot(golden_df, weighted_df):
    assert one(golden_df, SA.skewness("x")) == pytest.approx(0.075718, abs=TOL)
    assert one(golden_df, SA.kurtosis("x")) == pytest.approx(1.4400, abs=TOL)
    assert one(weighted_df, SA.stddev_weighted("x", "w")) == pytest.approx(6.0539, abs=TOL)
    assert one(weighted_df, SA.skewness_weighted("x", "w")) == pytest.approx(0.075718, abs=TOL)
    assert one(weighted_df, SA.kurtosis_weighted("x", "w")) == pytest.approx(1.4400, abs=TOL)


def test_two_stage_equals_one_shot(golden_df, weighted_df):
    """sums → re-aggregate → finalize == direct: the merge contract."""
    # simulate salted two-level aggregation: partial per salt, then merge
    partial = (
        golden_df.withColumn("salt", F.spark_partition_id())
        .groupBy("salt")
        .agg(*SA.moment_sums("x"))
    )
    merged = partial.agg(
        F.sum("m_n").alias("m_n"),
        *[F.sum(c).alias(c) for c in ["m_s1", "m_s2", "m_s3", "m_s4"]],
    )
    row = merged.select(
        SA.skewness_from_sums().alias("sk"),
        SA.kurtosis_from_sums().alias("ku"),
        SA.skewness_from_sums(sample=True).alias("sks"),
        SA.kurtosis_from_sums(sample=True).alias("kus"),
    ).collect()[0]
    assert row["sk"] == pytest.approx(one(golden_df, SA.skewness("x")), abs=1e-10)
    assert row["ku"] == pytest.approx(one(golden_df, SA.kurtosis("x")), abs=1e-10)
    assert row["sks"] == pytest.approx(one(golden_df, SA.skewness("x", sample=True)), abs=1e-10)
    assert row["kus"] == pytest.approx(one(golden_df, SA.kurtosis("x", sample=True)), abs=1e-10)

    wpartial = (
        weighted_df.withColumn("salt", F.spark_partition_id())
        .groupBy("salt")
        .agg(*SA.weighted_sums("x", "w"))
    )
    wm = wpartial.agg(*[F.sum(c).alias(c) for c in ["w_sw", "w_swx", "w_swx2", "w_swx3", "w_swx4"]])
    wrow = wm.select(
        SA.stddev_weighted_from_sums().alias("sd"),
        SA.skewness_weighted_from_sums().alias("sk"),
        SA.kurtosis_weighted_from_sums().alias("ku"),
    ).collect()[0]
    assert wrow["sd"] == pytest.approx(6.0539, abs=TOL)
    assert wrow["sk"] == pytest.approx(0.075718, abs=TOL)
    assert wrow["ku"] == pytest.approx(1.4400, abs=TOL)


def test_builtin_cross_checks(golden_df):
    """Population skew == F.skewness; raw kurt == F.kurtosis + 3
    (the ±3 convention trap, SURVEY.md §7)."""
    row = golden_df.agg(
        SA.skewness("x").alias("ours"),
        F.skewness("x").alias("builtin_skew"),
        SA.kurtosis("x").alias("ours_kurt"),
        F.kurtosis("x").alias("builtin_kurt"),
    ).collect()[0]
    assert row["ours"] == pytest.approx(row["builtin_skew"], abs=1e-8)
    assert row["ours_kurt"] == pytest.approx(row["builtin_kurt"] + 3.0, abs=1e-8)


def test_center_shift_invariance(golden_df, weighted_df):
    for col in [SA.skewness("x", center=10.0), SA.kurtosis("x", sample=True, center=10.0)]:
        pass
    assert one(golden_df, SA.skewness("x", center=10.5)) == pytest.approx(
        one(golden_df, SA.skewness("x")), abs=1e-9
    )
    assert one(golden_df, SA.kurtosis("x", center=10.5)) == pytest.approx(
        one(golden_df, SA.kurtosis("x")), abs=1e-9
    )
    assert one(weighted_df, SA.stddev_weighted("x", "w", center=9.0)) == pytest.approx(
        one(weighted_df, SA.stddev_weighted("x", "w")), abs=1e-9
    )
    assert one(weighted_df, SA.kurtosis_weighted("x", "w", center=9.0)) == pytest.approx(
        one(weighted_df, SA.kurtosis_weighted("x", "w")), abs=1e-9
    )


def test_edge_cases_on_dataframes(spark):
    df = spark.createDataFrame([Row(x=1.0), Row(x=2.0)])
    assert math.isnan(one(df, SA.skewness("x", sample=True)))
    df3 = spark.createDataFrame([Row(x=1.0), Row(x=2.0), Row(x=3.0)])
    assert math.isnan(one(df3, SA.kurtosis("x", sample=True)))
    const = spark.createDataFrame([Row(x=1.0)] * 4)
    assert one(const, SA.skewness("x")) == 0.0
    assert one(const, SA.kurtosis("x", sample=True)) == 0.0
    zw = spark.createDataFrame([Row(x=0.0, w=0.0)] * 3)
    assert one(zw, SA.stddev_weighted("x", "w")) == 0.0
    assert one(zw, SA.skewness_weighted("x", "w")) == 0.0
    assert one(zw, SA.kurtosis_weighted("x", "w")) == 0.0


def test_grouped_stats_on_events(spark, sf_dir):
    """Grouped aggregation on the driver's events table vs pandas oracle."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: (r["sk"], r["sds"])
        for r in df.groupBy("event_type")
        .agg(
            SA.skewness("value", sample=True).alias("sk"),
            SA.stddev_weighted("value", F.lit(1.0)).alias("sds"),
        )
        .collect()
    }
    pdf = df.select("event_type", "value").toPandas()
    for et, grp in pdf.groupby("event_type"):
        assert got[et][0] == pytest.approx(grp["value"].skew(), abs=1e-8)
        assert got[et][1] == pytest.approx(grp["value"].std(ddof=0), abs=1e-8)


def test_plan_is_single_hash_aggregate(golden_df):
    """All five one-shot stats over the same column must plan as ONE
    HashAggregate pair (partial+final) with deduped sum children and no
    Python UDFs — the scale-critical property."""
    plan = golden_df.agg(*SA.all_stats("x", F.lit(1.0)))._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
