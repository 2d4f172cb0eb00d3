#!/usr/bin/env bash
# North-rule two-cluster-size evidence (sandbox substitution): run the
# identical spark-submit --py-files job at local[8] (N) and local[32] (4N)
# on the same input, then report throughput at both + scaling efficiency.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
SEQ="${SPARK_GRAFT_BENCH_SEQUENCES:-500000}"

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

for CPUS in 8 32; do
  echo "=== local[$CPUS] ===" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_SEQUENCES=$SEQ \
  spark-submit --master "local[$CPUS]" \
    --conf spark.driver.memory=48g \
    --py-files BENCH/kuss_pkg.zip \
    bench.py 2>/dev/null | tail -1 > "BENCH/bench_local${CPUS}.json"
  cat "BENCH/bench_local${CPUS}.json" >&2
done

python BENCH/report_scaling.py
