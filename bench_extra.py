#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
noop-sink isolation timing + .explain("formatted") plan dumps.

NOT part of the frozen measurement contract (bench.py is); this exists so
optimization work can time the computation without the count() sink and
capture plan shapes per query.

Usage:
  python bench_extra.py time  [query ...]   # noop-sink wall seconds
  python bench_extra.py plan  [query ...]   # dump plans/r07/<q>_{label}.txt
  python bench_extra.py rows  [query ...]   # row counts (sanity)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), KUSS_REPEATS (default 1), KUSS_PLAN_LABEL (default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("KUSS_REPEATS", "1"))
PLAN_LABEL = os.environ.get("KUSS_PLAN_LABEL", "before")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]

    from bench import build_spark, warm_python_workers, HEADLINE
    from ksql_udaf_statistics_spark.plans.queries import QUERIES
    from ksql_udaf_statistics_spark.sources.tables import TABLE_NAMES

    if not names:
        names = list(HEADLINE)

    spark = build_spark(CPUS)
    for t in TABLE_NAMES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    warm_python_workers(spark)

    out: dict[str, object] = {"sf_dir": SF_DIR, "mode": mode}
    times: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        if mode == "plan":
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r07/{name}_{PLAN_LABEL}.txt"
            with open(path, "w") as f:
                f.write(p)
            print(f"wrote {path}", file=sys.stderr)
            continue
        samples = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.perf_counter()
            if mode == "rows":
                n = fn(spark, SF_DIR).count()
                out.setdefault("rows", {})[name] = n  # type: ignore[union-attr]
            else:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        times[name] = samples
        print(f"{name}: {samples}", file=sys.stderr)
    if mode != "plan":
        out["queries"] = {k: min(v) for k, v in times.items()}
        out["samples"] = times
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
