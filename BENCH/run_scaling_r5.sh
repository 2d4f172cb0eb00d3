#!/usr/bin/env bash
# Round-5 two-cluster-size evidence. Same protocol as run_scaling_r4.sh
# (interleaved spark-submit --py-files reps on byte-identical input; two
# criterion instances 2->8 primary and 4->16), with two additions:
#  - every rep file now embeds a Spark-free host-ceiling probe
#    (bench.py r5), so each rep is self-attributing for contention;
#  - two same-window RocksDB-vs-HDFS state-provider A/B pairs at
#    local[16] (r4's A/B was contention-window-dependent; VERDICT r4
#    directive 8 asks for interleaved pairs).
# r4 rep files (pre-probe bench) are archived to BENCH/r4/.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
SEQ="${SPARK_GRAFT_BENCH_SEQUENCES:-24000000}"
CYCLES="${SPARK_GRAFT_BENCH_REPS:-4}"
EXTRA_PAIRS="${SPARK_GRAFT_EXTRA_PAIRS:-2}"

cd "$REPO"
mkdir -p BENCH/r4
for f in BENCH/stream_local*_rep*.json BENCH/batch_local*.json; do
  [ -e "$f" ] && git ls-files --error-unmatch "$f" >/dev/null 2>&1 && \
    mv "$f" BENCH/r4/ 2>/dev/null || true
done

python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("BENCH/kuss_pkg.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("ksql_udaf_statistics_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

STREAM_SRC="${SPARK_GRAFT_STREAM_SRC:-/tmp/kuss_stream_src_${SEQ}}"

run_bench () {  # $1=CPUS $2=MODE $3=outfile [$4=state provider]
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$1" SPARK_GRAFT_MODE="$2" \
  SPARK_GRAFT_BENCH_SEQUENCES="$SEQ" SPARK_GRAFT_STREAM_SRC="$STREAM_SRC" \
  SPARK_GRAFT_STREAM_ATTEMPTS=1 \
  SPARK_GRAFT_STATE_PROVIDER="${4:-rocksdb}" \
  spark-submit --master "local[$1]" \
    --conf spark.driver.memory=16g \
    --py-files BENCH/kuss_pkg.zip \
    bench.py 2>/dev/null | tail -1 > "$3"
  # kill only lingering spark-submit JVMs, never co-resident pyspark shells
  pkill -9 -f org.apache.spark.deploy.SparkSubmit >/dev/null 2>&1 || true
  sleep 2
}

run_bench 4  batch "BENCH/batch_local4.json"
run_bench 16 batch "BENCH/batch_local16.json"

# same-window state-provider A/B pairs first (each pair is back-to-back
# at local[16] so both providers see the same host weather)
for ab in 1 2; do
  echo "=== A/B pair $ab rocksdb vs hdfs (local[16]) ===" >&2
  run_bench 16 streaming "BENCH/ab_rocksdb_${ab}.json" rocksdb
  run_bench 16 streaming "BENCH/ab_hdfs_${ab}.json" hdfs
  cat "BENCH/ab_rocksdb_${ab}.json" "BENCH/ab_hdfs_${ab}.json" >&2
done

# interleaved cycles across BOTH criterion pairs (2,8) and (4,16)
for rep in $(seq 1 "$CYCLES"); do
  for CPUS in 2 8 4 16; do
    echo "=== rep $rep local[$CPUS] streaming ===" >&2
    run_bench "$CPUS" streaming "BENCH/stream_local${CPUS}_rep${rep}.json"
    cat "BENCH/stream_local${CPUS}_rep${rep}.json" >&2
  done
done

# extra 2/8 pairs: 2->8 is the primary criterion instance; more same-rep
# pairs tighten the median the report now leads with
for rep in $(seq $((CYCLES + 1)) $((CYCLES + EXTRA_PAIRS))); do
  for CPUS in 2 8; do
    echo "=== rep $rep local[$CPUS] streaming ===" >&2
    run_bench "$CPUS" streaming "BENCH/stream_local${CPUS}_rep${rep}.json"
    cat "BENCH/stream_local${CPUS}_rep${rep}.json" >&2
  done
done

python BENCH/hw_ceiling.py 4 16 > BENCH/hw_ceiling.json
python - <<'EOF'
import json, datetime
d = json.load(open("BENCH/hw_ceiling.json"))
d["measured_at"] = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%MZ")
with open("BENCH/hw_ceiling_snapshots.jsonl", "a") as f:
    f.write(json.dumps(d) + "\n")
EOF
python BENCH/report_scaling.py 4 16 "$CYCLES"
echo "=== r5 scaling run complete ==="
