#!/usr/bin/env python
"""Benchmark harness.

Runs the headline batch queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the flagship streaming job (tumbling-window
moment statistics over a synthesized token-sequence table with the
exactly-once foreachBatch sink) on local[$SPARK_GRAFT_CPUS], and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "streaming": {"sequences_per_sec": ..., "batch_p50_ms": ...,
                 "n_sequences": ..., "n_batches": ...}}

The N-vs-4N scaling evidence (north_rule) is produced by BENCH/run_scaling.sh,
which invokes this file at two parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# streaming corpus size: ~0.5M sequences keeps the bench < ~1 min at 32 cores
N_SEQ = int(os.environ.get("SPARK_GRAFT_BENCH_SEQUENCES", "500000"))

HEADLINE = [
    "skewness_pop",
    "kurtosis_sample",
    "stddev_weighted",
    "skewness_weighted",
    "kurtosis_weighted",
    "tumbling_window_stats",
    "sliding_window_stats",
    "session_window_stats",
    "token_stats_by_source",
    "pricing_summary",
    "order_stats_by_segment",
    "text_profile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"kuss-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def bench_batch(spark) -> dict[str, float]:
    from ksql_udaf_statistics_spark.plans.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        # count() forces full execution without driver-side result transfer
        fn(spark, SF_DIR).count()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def bench_streaming(spark) -> dict:
    from ksql_udaf_statistics_spark.sources.tables import (
        synthesize_token_table, token_value_streams,
    )
    from ksql_udaf_statistics_spark.streaming.jobs import windowed_stats
    from ksql_udaf_statistics_spark.streaming.sink import (
        ExactlyOnceParquetSink, run_streaming_stats,
    )

    work = tempfile.mkdtemp(prefix="kuss_bench_")
    src = os.path.join(work, "src")
    try:
        tok = synthesize_token_table(
            spark, N_SEQ, seed=42, duration_seconds=7200, partitions=CPUS
        )
        # 4*CPUS files -> several micro-batches at maxFilesPerTrigger=CPUS
        token_value_streams(tok).repartition(CPUS * 4).write.parquet(src)
        schema = spark.read.parquet(src).schema

        transform = lambda df: windowed_stats(
            df, value="token_mean", weight="n_tok",
            window_size="5 minutes", watermark="4 hours",
        )
        sink = ExactlyOnceParquetSink(
            os.path.join(work, "sink"), key_cols=["window_start", "source"]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", CPUS)
            .parquet(src)
        )
        batch_ms: list[float] = []
        t0 = time.perf_counter()
        q = run_streaming_stats(
            stream, sink, os.path.join(work, "ckpt"), transform,
            output_mode="update",
        )
        while q.isActive:
            q.awaitTermination(0.5)
            p = q.lastProgress
            if p and p.batchDuration is not None:
                batch_ms.append(float(p.batchDuration))
        elapsed = time.perf_counter() - t0
        batch_ms = sorted(set(batch_ms))
        return {
            "n_sequences": N_SEQ,
            "elapsed_sec": round(elapsed, 3),
            "sequences_per_sec": round(N_SEQ / elapsed, 1),
            "n_batches": len(sink.committed_batches()),
            "batch_p50_ms": statistics.median(batch_ms) if batch_ms else None,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    spark = build_spark(CPUS)
    t0 = time.perf_counter()
    queries = bench_batch(spark)
    streaming = bench_streaming(spark)
    total = round(time.perf_counter() - t0, 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "windowed-aggregate throughput (sequences/sec), "
                          "micro-batch p50 latency, and headline batch query "
                          "wall time under exactly-once semantics",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf),
                "cpus": CPUS,
                "streaming": streaming,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
