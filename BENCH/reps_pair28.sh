#!/usr/bin/env bash
# N=2 vs 4N=8 corroboration pair (interleaved reps)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SEQ=24000000
STREAM_SRC="/tmp/kuss_stream_src_${SEQ}"
cd "$REPO"
run_bench () {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$1" SPARK_GRAFT_MODE=streaming \
  SPARK_GRAFT_BENCH_SEQUENCES="$SEQ" SPARK_GRAFT_STREAM_SRC="$STREAM_SRC" \
  spark-submit --master "local[$1]" --conf spark.driver.memory=16g \
    --py-files BENCH/kuss_pkg.zip bench.py 2>/dev/null | tail -1 > "$2"
  pkill -9 java >/dev/null 2>&1 || true
  sleep 2
}
FIRST="${1:-1}"; LAST="${2:-2}"
for rep in $(seq "$FIRST" "$LAST"); do
  for CPUS in 8 2; do
    echo "=== pair rep $rep local[$CPUS] ===" >&2
    run_bench "$CPUS" "BENCH/stream_local${CPUS}_rep${rep}.json"
    cat "BENCH/stream_local${CPUS}_rep${rep}.json" >&2
  done
  python BENCH/report_scaling.py 4 16 44 || true
done
