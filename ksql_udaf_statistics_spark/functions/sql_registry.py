"""SQL-callable registration surface — the ksqlDB `SHOW FUNCTIONS` parity.

The reference registers its UDAFs by annotation scanning and dispatches
them by name in SQL (UdafMetadata.java:23-31, AllUdafIT.java:116-153).
Here the same surface is exposed two ways:

1. ``register_sql_functions(spark)`` — registers Arrow-batched grouped-agg
   pandas UDFs so plain ``spark.sql("SELECT stddev_weighted(v, w) ...")``
   works. These wrap the pure kernel (stats.moments) and are the slow path
   (one Python hop per group) — convenient for ad-hoc SQL, not the engine
   hot path.
2. ``SQL_EXPRESSIONS`` — the fast path for SQL users: each statistic as a
   SQL expression *string template* (the sum-decomposition from
   stats.spark_agg), usable inside any SELECT without Python at all.

Spark resolves built-in functions before session UDFs, so the unweighted
pair get a ``_stat`` suffix (``skewness_stat``, ``kurtosis_stat``) to avoid
silently hitting Spark's builtins, whose conventions differ (builtin
kurtosis is excess; ours is the reference's raw form).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..stats import moments as M


def _build_udfs() -> dict:
    @pandas_udf("double")
    def skewness_stat(v: pd.Series) -> float:
        return M.finalize_skewness(M.MomentState.zero().update(v.to_numpy()))

    @pandas_udf("double")
    def skewness_sample_stat(v: pd.Series) -> float:
        return M.finalize_skewness(
            M.MomentState.zero().update(v.to_numpy()), sample=True
        )

    @pandas_udf("double")
    def kurtosis_stat(v: pd.Series) -> float:
        return M.finalize_kurtosis(M.MomentState.zero().update(v.to_numpy()))

    @pandas_udf("double")
    def kurtosis_sample_stat(v: pd.Series) -> float:
        return M.finalize_kurtosis(
            M.MomentState.zero().update(v.to_numpy()), sample=True
        )

    @pandas_udf("double")
    def stddev_weighted(v: pd.Series, w: pd.Series) -> float:
        return M.finalize_stddev_weighted(
            M.WeightedState.zero().update(v.to_numpy(), w.to_numpy())
        )

    @pandas_udf("double")
    def skewness_weighted(v: pd.Series, w: pd.Series) -> float:
        return M.finalize_skewness_weighted(
            M.WeightedState.zero().update(v.to_numpy(), w.to_numpy())
        )

    @pandas_udf("double")
    def kurtosis_weighted(v: pd.Series, w: pd.Series) -> float:
        return M.finalize_kurtosis_weighted(
            M.WeightedState.zero().update(v.to_numpy(), w.to_numpy())
        )

    return {
        "skewness_stat": skewness_stat,
        "skewness_sample_stat": skewness_sample_stat,
        "kurtosis_stat": kurtosis_stat,
        "kurtosis_sample_stat": kurtosis_sample_stat,
        "stddev_weighted": stddev_weighted,
        "skewness_weighted": skewness_weighted,
        "kurtosis_weighted": kurtosis_weighted,
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register all statistics as SQL grouped-aggregate functions.

    Returns the registered names (the Python analogue of SHOW FUNCTIONS).
    """
    fns = _build_udfs()
    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return sorted(fns)


#: reference SQL names that collide with Spark builtins whose conventions
#: differ (builtin skewness/kurtosis are sample G1 / population EXCESS;
#: the reference's are population RAW — README.md:31, SkewnessUdaf.java:166).
_BUILTIN_COLLISIONS = {"skewness": "skewness_stat", "kurtosis": "kurtosis_stat"}


def register_reference_names(spark: SparkSession, force: bool = False) -> list[str]:
    """Register the UDAFs under the reference's exact SQL names.

    ``skewness`` and ``kurtosis`` collide with Spark builtins of DIFFERENT
    semantics (builtin = sample G1 / population EXCESS kurtosis; reference
    = population RAW). A session-registered UDF SHADOWS the builtin in
    Spark's session function registry (verified on this Spark version by
    tests/test_sql_registry.py::test_reference_name_registration_guard),
    so forcing the registration silently changes what ``skewness(x)`` /
    ``kurtosis(x)`` mean for EVERY query in the session — including code
    that expected Spark's conventions. This refuses by default with the
    exact remedy; ``force=True`` registers (giving SQL users the
    reference's semantics under the reference's names) and emits a loud
    warning. ``DROP TEMPORARY FUNCTION skewness`` restores the builtin.
    """
    if not force:
        hints = ", ".join(f"{k} -> {v}" for k, v in _BUILTIN_COLLISIONS.items())
        raise ValueError(
            "Refusing to register UDAFs under reference names that SHADOW "
            "Spark builtins of DIFFERENT semantics for the whole session "
            f"({hints}). Call register_sql_functions() and use the _stat "
            "names, or pass force=True to accept that SQL 'skewness'/"
            "'kurtosis' will switch to the REFERENCE conventions "
            "(population raw) session-wide."
        )
    import warnings

    registered = register_sql_functions(spark)
    fns = _build_udfs()
    for ref_name, stat_name in _BUILTIN_COLLISIONS.items():
        spark.udf.register(ref_name, fns[stat_name])
        registered.append(ref_name)
    warnings.warn(
        "Registered UDAFs under the reference names "
        f"{sorted(_BUILTIN_COLLISIONS)}; they SHADOW Spark's same-named "
        "builtin functions in this session — SQL skewness/kurtosis now "
        "follow the reference's conventions (population RAW), not Spark's "
        "(sample G1 / excess). DROP TEMPORARY FUNCTION <name> restores "
        "the builtin.",
        stacklevel=2,
    )
    return sorted(registered)
