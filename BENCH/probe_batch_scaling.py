#!/usr/bin/env python
"""Diagnostic 3: scaling of the flagship's COMPUTE alone (batch, no
streaming machinery): read the same token corpus, run the same explode +
windowed moment aggregation, count. Prints timing at the given
parallelism. Usage: python BENCH/probe_batch_scaling.py <cpus> [reps]."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_SEQ = int(os.environ.get("SPARK_GRAFT_BENCH_SEQUENCES", "8000000"))
SRC = f"/tmp/kuss_stream_src_{N_SEQ}"
STATE_PARTS = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "8"))


def main():
    from bench import build_spark, prepare_stream_source
    from ksql_udaf_statistics_spark.streaming.jobs import (
        token_value_windowed_stats,
    )

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    prepare_stream_source(spark, SRC)
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTS))
    df = spark.read.parquet(SRC)
    agg = token_value_windowed_stats(df, window_size="5 minutes")
    times = []
    for i in range(REPS + 1):  # +1 warmup
        t0 = time.perf_counter()
        agg.count()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(round(dt, 2))
    print(json.dumps({"cpus": CPUS, "n_seq": N_SEQ, "times": times,
                      "best": min(times),
                      "rows_per_sec": round(N_SEQ / min(times))}))
    spark.stop()


if __name__ == "__main__":
    main()
