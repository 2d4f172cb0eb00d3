#!/usr/bin/env python
"""Diagnostic: per-micro-batch durationMs breakdown of the streaming
flagship at one parallelism level — locates the serial (non-scaling) term
in trigger time. Usage: python BENCH/probe_breakdown.py <cpus> [n_seq]."""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_SEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
SRC = os.environ.get("SPARK_GRAFT_STREAM_SRC", f"/tmp/kuss_stream_src_{N_SEQ}")
STATE_PARTS = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "8"))
FILES_PER_TRIGGER = int(os.environ.get("SPARK_GRAFT_FILES_PER_TRIGGER", "86"))


def main():
    from bench import build_spark, prepare_stream_source
    from ksql_udaf_statistics_spark.streaming.jobs import (
        token_value_windowed_stats,
    )
    from ksql_udaf_statistics_spark.streaming.sink import (
        ExactlyOnceParquetSink, run_streaming_stats,
    )

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    prepare_stream_source(spark, SRC)
    schema = spark.read.parquet(SRC).schema
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTS))
    work = tempfile.mkdtemp(prefix="kuss_probe_")
    try:
        sink = ExactlyOnceParquetSink(
            os.path.join(work, "sink"), key_cols=["window_start", "source"]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(SRC)
        )
        seen = {}
        q = run_streaming_stats(
            stream, sink, os.path.join(work, "ckpt"),
            lambda df: token_value_windowed_stats(
                df, window_size="5 minutes", watermark="4 hours"
            ),
            output_mode="update",
        )
        while q.isActive:
            q.awaitTermination(0.25)
            p = q.lastProgress
            if p and p.batchId not in seen:
                seen[p.batchId] = json.loads(p.json)
        for bid in sorted(seen):
            pr = seen[bid]
            out = {"cpus": CPUS, "batchId": bid,
                   "rows": pr.get("numInputRows"),
                   "durationMs": pr.get("durationMs"),
                   "stateOperators": [
                       {k: so.get(k) for k in (
                           "numRowsTotal", "numRowsUpdated",
                           "allUpdatesTimeMs", "allRemovalsTimeMs",
                           "commitTimeMs", "stateMemory")}
                       for so in pr.get("stateOperators", [])]}
            print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
