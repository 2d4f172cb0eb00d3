#!/usr/bin/env bash
# Append additional interleaved streaming reps (continuing the rep numbering)
# and regenerate BASELINE.md after each pair. The host shows time-varying
# co-tenant contention (zero steal, full vCPU delivery, reduced
# instructions/vCPU-second) that randomly halves whole runs, so capability
# is best-of-many interleaved reps; see report_scaling.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
SEQ="${SPARK_GRAFT_BENCH_SEQUENCES:-24000000}"
N_SMALL="${SPARK_GRAFT_N:-4}"
N_BIG="${SPARK_GRAFT_4N:-16}"
FIRST="${1:-6}"
LAST="${2:-9}"
STREAM_SRC="${SPARK_GRAFT_STREAM_SRC:-/tmp/kuss_stream_src_${SEQ}}"

cd "$REPO"

run_bench () {  # $1=CPUS $2=outfile
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$1" SPARK_GRAFT_MODE=streaming \
  SPARK_GRAFT_BENCH_SEQUENCES="$SEQ" SPARK_GRAFT_STREAM_SRC="$STREAM_SRC" \
  spark-submit --master "local[$1]" \
    --conf spark.driver.memory=16g \
    --py-files BENCH/kuss_pkg.zip \
    bench.py 2>/dev/null | tail -1 > "$2"
  pkill -9 java >/dev/null 2>&1 || true
  sleep 2
}

for rep in $(seq "$FIRST" "$LAST"); do
  for CPUS in "$N_SMALL" "$N_BIG"; do
    echo "=== rep $rep local[$CPUS] streaming ===" >&2
    run_bench "$CPUS" "BENCH/stream_local${CPUS}_rep${rep}.json"
    cat "BENCH/stream_local${CPUS}_rep${rep}.json" >&2
  done
  python BENCH/report_scaling.py "$N_SMALL" "$N_BIG" "$rep" || true
done
