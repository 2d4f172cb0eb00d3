#!/usr/bin/env python
"""Diagnostic 2: time the phases INSIDE the foreachBatch sink (aggregate
materialization vs parquet write vs lineage) to find the serial term.
Usage: python BENCH/probe_sink_phases.py <cpus>."""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_SEQ = int(os.environ.get("SPARK_GRAFT_BENCH_SEQUENCES", "8000000"))
SRC = f"/tmp/kuss_stream_src_{N_SEQ}"
STATE_PARTS = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "8"))


def main():
    from pyspark.sql import functions as F

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
    work = tempfile.mkdtemp(prefix="kuss_probe2_")

    phases = []

    class TimedSink(ExactlyOnceParquetSink):
        def _write_batch(self, batch_df, batch_id):
            t0 = time.perf_counter()
            batch_df.persist()
            n = batch_df.count()  # materialize the aggregate: the parallel part
            t1 = time.perf_counter()
            out = batch_df.withColumn("batch_id", F.lit(batch_id)).coalesce(1)
            (
                out.write.mode("overwrite").partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(os.path.join(self.path, "data"))
            )
            t2 = time.perf_counter()
            lineage = batch_df.groupBy(F.spark_partition_id().alias("p")).agg(
                F.count(F.lit(1)).alias("n")).collect()
            t3 = time.perf_counter()
            batch_df.unpersist()
            phases.append({
                "batch_id": batch_id, "agg_rows": n,
                "compute_s": round(t1 - t0, 2),
                "write_s": round(t2 - t1, 2),
                "lineage_s": round(t3 - t2, 2),
            })

    try:
        sink = TimedSink(os.path.join(work, "sink"),
                         key_cols=["window_start", "source"])
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 86).parquet(SRC)
        )
        seen = {}
        q = run_streaming_stats(
            stream, sink, os.path.join(work, "ckpt"),
            lambda df: token_value_windowed_stats(
                df, window_size="5 minutes", watermark="4 hours"),
            output_mode="update",
        )
        while q.isActive:
            q.awaitTermination(0.25)
            p = q.lastProgress
            if p and p.batchId not in seen:
                seen[p.batchId] = {"rows": int(p.numInputRows),
                                   "addBatch": p.durationMs.get("addBatch"),
                                   "trigger": p.durationMs.get("triggerExecution")}
        for ph in phases:
            b = seen.get(ph["batch_id"], {})
            print(json.dumps({"cpus": CPUS, **ph, **b}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
