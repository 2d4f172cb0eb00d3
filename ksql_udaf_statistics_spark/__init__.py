"""ksql_udaf_statistics_spark — a PySpark-native streaming statistics engine.

Re-expresses the aggregate surface of ``kcharkseliani/ksql-udaf-statistics``
(five ksqlDB UDAFs: skewness, kurtosis, weighted stddev/skewness/kurtosis;
reference at /root/reference, MIT) as an idiomatic Spark engine:

- every UDAF decomposes into built-in ``sum()`` aggregates over power terms
  plus a closed-form finalize Column expression (``stats.spark_agg``), so
  Spark's partial/final hash aggregation IS the reference's ``merge()``
  contract (SkewnessUdaf.java:198-206) and the whole hot path stays inside
  whole-stage codegen — zero per-row Python;
- the same accumulator algebra exists as a pure-numpy kernel
  (``stats.moments``) mirroring initialize/aggregate/merge/map for unit
  tests, exactly like the reference's JUnit layer;
- windowed streaming (tumbling/sliding/session + watermarks), an
  exactly-once idempotent sink with checkpoint resume, and a watermarked
  stream-stream join live in ``streaming``;
- large-scale training-data operators (dedup, ANN similarity, text
  analysis, multimodal plumbing) live in ``operators``.
"""

__version__ = "0.1.0"
