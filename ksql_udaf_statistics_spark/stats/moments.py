"""Pure-Python/numpy moment-accumulator kernel.

Mirrors the ksqlDB UDAF lifecycle of the reference —
``initialize() -> aggregate(row, acc) -> merge(a, b) -> map(acc)`` — as plain
functions over dataclass states, so pytest can exercise the identical
contract without a SparkSession (reference test structure:
SkewnessUdafTest.java:64-218).

Semantics reproduced exactly (with file:line cites into /root/reference):

- unweighted state = raw power sums (count, Σx, Σx², Σx³[, Σx⁴])
  (SkewnessUdaf.java:45-50, KurtosisUdaf.java:48-54);
- weighted state = (Σw·x, Σw, Σw·x², Σw·x³[, Σw·x⁴])
  (WeightedStdDevUdaf.java:43-47, WeightedKurtosisUdaf.java:49-55);
- merge = field-wise addition (SkewnessUdaf.java:198-206) — a commutative
  monoid, which is what makes the Spark sum-column decomposition exact;
- finalize formulas and guards:
  * n==0 -> 0.0                      (SkewnessUdaf.java:158-160)
  * sample skew, n<3 -> NaN          (SkewnessUdaf.java:162-164)
  * sample kurt, n<4 -> NaN          (KurtosisUdaf.java:168-170)
  * variance<=0 -> 0.0 (after Bessel for sample variants)
                                     (SkewnessUdaf.java:173-175; the
    reference tests ``== 0`` — we widen to ``<= 0`` because raw-sum FP
    cancellation can yield variance = -ε where Java silently emits
    Inf/NaN but ANSI Spark would raise DIVIDE_BY_ZERO; on the
    reference's own test vectors the branch behavior is identical)
  * Σw==0 -> 0.0                     (WeightedStdDevUdaf.java:129-132)
  * population kurtosis is RAW m4/var² (KurtosisUdaf.java:187); sample
    kurtosis is EXCESS G2 (KurtosisUdaf.java:189-195) — asymmetric on
    purpose; never substitute Spark's built-ins (both are excess).

All update functions are numpy-vectorized (no per-row Python), matching the
input_hint requirement; they double as the body of the Arrow-batched
``applyInPandas`` variant in ``stats/spark_agg.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

__all__ = [
    "MomentState",
    "WeightedState",
    "finalize_skewness",
    "finalize_kurtosis",
    "finalize_stddev_weighted",
    "finalize_skewness_weighted",
    "finalize_kurtosis_weighted",
]


@dataclass(frozen=True)
class MomentState:
    """Unweighted accumulator: raw power sums up to the 4th moment.

    The reference keeps Σx³ only for skewness and adds Σx⁴ for kurtosis;
    we carry all four — the extra sum is free and lets one state service
    both finalizers.
    """

    count: int = 0
    s1: float = 0.0  # Σx
    s2: float = 0.0  # Σx²
    s3: float = 0.0  # Σx³
    s4: float = 0.0  # Σx⁴

    @staticmethod
    def zero() -> "MomentState":
        """initialize(): zeroed state (SkewnessUdaf.java:111-118)."""
        return MomentState()

    def update(self, values) -> "MomentState":
        """aggregate(): vectorized over a batch of values.

        Equivalent to folding SkewnessUdaf.java:127-145 /
        KurtosisUdaf.java:131-151 over the batch, but in one numpy pass.
        """
        x = np.asarray(values, dtype=np.float64)
        x = x[~np.isnan(x)]  # SQL aggregates skip NULLs; ksqlDB never feeds null
        x2 = x * x
        return MomentState(
            count=self.count + int(x.size),
            s1=self.s1 + float(x.sum()),
            s2=self.s2 + float(x2.sum()),
            s3=self.s3 + float((x2 * x).sum()),
            s4=self.s4 + float((x2 * x2).sum()),
        )

    def merge(self, other: "MomentState") -> "MomentState":
        """merge(): field-wise addition (SkewnessUdaf.java:198-206)."""
        return MomentState(
            self.count + other.count,
            self.s1 + other.s1,
            self.s2 + other.s2,
            self.s3 + other.s3,
            self.s4 + other.s4,
        )


@dataclass(frozen=True)
class WeightedState:
    """Weighted accumulator: Σw·xᵏ sums (frequency-weight semantics).

    Integer weights reproduce the unweighted statistic on the expanded
    multiset (WeightedSkewnessUdafTest.java:100-127).
    """

    sw: float = 0.0    # Σw
    swx: float = 0.0   # Σw·x
    swx2: float = 0.0  # Σw·x²
    swx3: float = 0.0  # Σw·x³
    swx4: float = 0.0  # Σw·x⁴

    @staticmethod
    def zero() -> "WeightedState":
        return WeightedState()

    def update(self, values, weights) -> "WeightedState":
        """aggregate(): vectorized (WeightedKurtosisUdaf.java:107-124)."""
        x = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.float64)
        keep = ~(np.isnan(x) | np.isnan(w))
        x, w = x[keep], w[keep]
        wx = w * x
        return WeightedState(
            sw=self.sw + float(w.sum()),
            swx=self.swx + float(wx.sum()),
            swx2=self.swx2 + float((wx * x).sum()),
            swx3=self.swx3 + float((wx * x * x).sum()),
            swx4=self.swx4 + float((wx * x * x * x).sum()),
        )

    def merge(self, other: "WeightedState") -> "WeightedState":
        """merge(): field-wise addition (WeightedStdDevUdaf.java:151-163)."""
        return WeightedState(
            self.sw + other.sw,
            self.swx + other.swx,
            self.swx2 + other.swx2,
            self.swx3 + other.swx3,
            self.swx4 + other.swx4,
        )


def finalize_skewness(state: MomentState, sample: bool = False) -> float:
    """map() for SKEWNESS / SKEWNESS(isSample) (SkewnessUdaf.java:153-189).

    Population: m3 / var^1.5.  Sample: Bessel-corrected variance then the
    n²/((n-1)(n-2)) correction — algebraically Commons-Math G1.
    """
    n = state.count
    if n == 0:
        return 0.0
    if sample and n < 3:
        return math.nan
    mean = state.s1 / n
    var = state.s2 / n - mean * mean
    if sample:
        var *= n / (n - 1.0)
    if var <= 0.0:
        return 0.0
    m3 = state.s3 / n - 3.0 * mean * (state.s2 / n) + 2.0 * mean**3
    skew = m3 / max(var, 0.0) ** 1.5
    if sample:
        skew *= (n * n) / ((n - 1.0) * (n - 2.0))
    return skew


def finalize_kurtosis(state: MomentState, sample: bool = False) -> float:
    """map() for KURTOSIS / KURTOSIS(isSample) (KurtosisUdaf.java:159-198).

    Population: RAW m4/var² (golden 1.4400, KurtosisUdafTest.java:122).
    Sample: EXCESS G2. The population/sample raw-vs-excess asymmetry is a
    reference behavior we preserve deliberately.
    """
    n = state.count
    if n == 0:
        return 0.0
    if sample and n < 4:
        return math.nan
    mean = state.s1 / n
    var = state.s2 / n - mean * mean
    m4 = (
        state.s4 / n
        - 4.0 * mean * (state.s3 / n)
        + 6.0 * mean * mean * (state.s2 / n)
        - 3.0 * mean**4
    )
    if sample:
        var *= n / (n - 1.0)
    if var <= 0.0:
        return 0.0
    kurt = m4 / (var * var)
    if sample:
        kurt = ((n * n * (n + 1.0)) / ((n - 1.0) * (n - 2.0) * (n - 3.0))) * kurt - (
            3.0 * (n - 1.0) * (n - 1.0)
        ) / ((n - 2.0) * (n - 3.0))
    return kurt


def finalize_stddev_weighted(state: WeightedState) -> float:
    """map() for STDDEV_WEIGHTED (WeightedStdDevUdaf.java:122-142).

    Weighted population stddev (frequency weights, no Bessel); Σw==0 -> 0.
    """
    if state.sw == 0.0:
        return 0.0
    mean = state.swx / state.sw
    var = state.swx2 / state.sw - mean * mean
    return math.sqrt(max(var, 0.0))


def finalize_skewness_weighted(state: WeightedState) -> float:
    """map() for SKEWNESS_WEIGHTED (WeightedSkewnessUdaf.java:131-161)."""
    if state.sw == 0.0:
        return 0.0
    mean = state.swx / state.sw
    var = state.swx2 / state.sw - mean * mean
    if var <= 0.0:
        return 0.0
    m3 = state.swx3 / state.sw - 3.0 * mean * (state.swx2 / state.sw) + 2.0 * mean**3
    return m3 / max(var, 0.0) ** 1.5


def finalize_kurtosis_weighted(state: WeightedState) -> float:
    """map() for KURTOSIS_WEIGHTED (WeightedKurtosisUdaf.java:132-161).

    RAW weighted kurtosis m4/var² (golden 1.4400,
    WeightedKurtosisUdafTest.java:134); Σw==0 or var==0 -> 0.
    """
    if state.sw == 0.0:
        return 0.0
    mean = state.swx / state.sw
    var = state.swx2 / state.sw - mean * mean
    if var <= 0.0:
        return 0.0
    m4 = (
        state.swx4 / state.sw
        - 4.0 * mean * (state.swx3 / state.sw)
        + 6.0 * mean * mean * (state.swx2 / state.sw)
        - 3.0 * mean**4
    )
    return m4 / (var * var)
