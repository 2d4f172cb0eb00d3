#!/usr/bin/env bash
# r6 part 4: two more local-cluster 2->8 PRIMARY pairs in the post-storm
# clean window (21:30+ UTC), zstd like reps 4-5.
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

for rep in 6 7; do
  echo "=== r6d lc pair $rep (zstd, clean window) ===" >&2
  run_bench 2 "BENCH/stream_lc2_rep${rep}.json" "local-cluster[2,1,4096]" 8 zstd
  run_bench 8 "BENCH/stream_lc8_rep${rep}.json" "local-cluster[8,1,4096]" 8 zstd
done
echo "=== r6d complete ===" >&2
