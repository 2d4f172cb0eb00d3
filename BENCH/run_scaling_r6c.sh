#!/usr/bin/env bash
# r6 part 3: 4->16 pairs in the post-21:30 UTC clean window (the day-long
# DRAM storm lifted ~21:30; the r6b pairs all ran contended 0.49-0.67).
# Same config as r6b's re-measure: sp8 + zstd, 24M-seq shared corpus.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
SEQ=24000000
STREAM_SRC=/tmp/kuss_stream_src_${SEQ}

run_bench () {  # $1=CPUS $2=outfile $3=master $4=state_partitions $5=codec
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$1" \
  SPARK_GRAFT_MODE=streaming SPARK_GRAFT_BENCH_SEQUENCES="$SEQ" \
  SPARK_GRAFT_STREAM_SRC="$STREAM_SRC" SPARK_GRAFT_STREAM_ATTEMPTS=1 \
  SPARK_GRAFT_MASTER="$3" SPARK_GRAFT_STATE_PARTITIONS="$4" \
  spark-submit --master "$3" \
    --conf spark.driver.memory=12g \
    --conf "spark.io.compression.codec=$5" \
    --py-files BENCH/kuss_pkg.zip \
    bench.py 2>/dev/null | tail -1 > "$2"
  pkill -9 -f org.apache.spark.deploy.SparkSubmit >/dev/null 2>&1 || true
  sleep 3
}

for rep in 3 4; do
  echo "=== r6c 4->16 pair $rep (sp8 zstd, clean window) ===" >&2
  run_bench 4  "BENCH/stream_r6_local4_rep${rep}.json"  "local[4]"  8 zstd
  run_bench 16 "BENCH/stream_r6_local16_rep${rep}.json" "local[16]" 8 zstd
done
echo "=== r6c complete ===" >&2
