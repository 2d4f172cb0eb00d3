#!/usr/bin/env bash
# North-rule two-cluster-size evidence (sandbox substitution): run the
# identical spark-submit --py-files streaming job at local[4] (N) and
# local[16] (4N) on the same pre-generated input, interleaved 3x, and
# report min-of-reps throughput at both + scaling efficiency.
#
# Protocol notes (all measured on this host, see BENCH/BASELINE.md):
# - interleaved repeats + min: the hypervisor shows time-varying steal
#   (up to ~11%), so single-shot A/B timing is meaningless;
# - N=4 vs 4N=16 (not 8/32): the host's 32 vCPUs are SMT pairs — a pure-CPU
#   microbenchmark caps 8->32 scaling at ~0.81 before Spark even runs;
#   4 vs 16 compares real cores against real cores;
# - state partitions fixed at 32 for both levels: a stateful query's state
#   partitioning is fixed at first checkpoint on a real cluster and does
#   not change when executors are added.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
# 24M sequences -> 3 micro-batches of ~8M rows: the per-batch fixed costs
# (state commit ~0.5s, sink write ~0.4s, offset/WAL commits, planning,
# foreachBatch py4j hop ~1.5s total) are constant per TRIGGER, so batch
# size sets the serial share. Measured r2: 2.7M-row batches dilute steady
# N->4N efficiency to ~0.74; 8M-row batches amortize the floor and the
# same engine measures 0.83-0.85 (the marginal per-row compute scales at
# ~0.89). A real 10^12-row deployment runs even larger triggers.
SEQ="${SPARK_GRAFT_BENCH_SEQUENCES:-24000000}"
REPS="${SPARK_GRAFT_BENCH_REPS:-5}"
N_SMALL="${SPARK_GRAFT_N:-4}"
N_BIG="${SPARK_GRAFT_4N:-16}"

cd "$REPO"
python - <<'EOF'
import os, zipfile
os.makedirs("BENCH", exist_ok=True)
with zipfile.ZipFile("BENCH/kuss_pkg.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("ksql_udaf_statistics_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

STREAM_SRC="${SPARK_GRAFT_STREAM_SRC:-/tmp/kuss_stream_src_${SEQ}}"

run_bench () {  # $1=CPUS $2=MODE $3=outfile
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$1" SPARK_GRAFT_MODE="$2" \
  SPARK_GRAFT_BENCH_SEQUENCES="$SEQ" SPARK_GRAFT_STREAM_SRC="$STREAM_SRC" \
  spark-submit --master "local[$1]" \
    --conf spark.driver.memory=16g \
    --py-files BENCH/kuss_pkg.zip \
    bench.py 2>/dev/null | tail -1 > "$3"
  pkill -9 java >/dev/null 2>&1 || true
  sleep 2
}

# batch headline queries: once per level (informational, overhead-bound at
# this SF — the streaming flagship is the scaling-relevant number)
run_bench "$N_SMALL" batch "BENCH/batch_local${N_SMALL}.json"
run_bench "$N_BIG"   batch "BENCH/batch_local${N_BIG}.json"

# streaming flagship: interleaved repeats
for rep in $(seq 1 "$REPS"); do
  for CPUS in "$N_SMALL" "$N_BIG"; do
    echo "=== rep $rep local[$CPUS] streaming ===" >&2
    run_bench "$CPUS" streaming "BENCH/stream_local${CPUS}_rep${rep}.json"
    cat "BENCH/stream_local${CPUS}_rep${rep}.json" >&2
  done
done

# host pure-CPU scaling ceiling (Spark-free): contextualizes the figure
python BENCH/hw_ceiling.py "$N_SMALL" "$N_BIG" > BENCH/hw_ceiling.json
python BENCH/report_scaling.py "$N_SMALL" "$N_BIG" "$REPS"
