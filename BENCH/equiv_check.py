#!/usr/bin/env python
"""Result-equivalence harness for optimization rounds.

Dumps (or compares against) a canonical snapshot of each query's FULL
result — all rows, all columns, exact repr of every value — so an
optimized plan can be proven bit-identical to the round-start plan.

Usage:
  python BENCH/equiv_check.py dump  <outdir> [query ...]
  python BENCH/equiv_check.py check <outdir> [query ...]

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (as bench.py).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def canonical(df) -> str:
    """Deterministic text form: schema line + every row sorted by its
    full repr (collect order independent), doubles via repr (exact)."""
    schema = df.schema.simpleString()
    rows = df.collect()
    lines = sorted(repr(tuple(r)) for r in rows)
    return schema + "\n" + "\n".join(lines) + "\n"


def main() -> None:
    mode, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from bench import build_spark
    from ksql_udaf_statistics_spark.plans.queries import QUERIES

    if not names:
        names = list(QUERIES)
    os.makedirs(outdir, exist_ok=True)
    spark = build_spark(CPUS)
    failures = []
    for name in names:
        text = canonical(QUERIES[name](spark, SF_DIR))
        digest = hashlib.sha256(text.encode()).hexdigest()
        path = os.path.join(outdir, f"{name}.txt")
        if mode == "dump":
            with open(path, "w") as f:
                f.write(text)
            print(f"{name}: {digest[:16]} ({text.count(chr(10)) - 1} rows)")
        else:
            with open(path) as f:
                want = f.read()
            ok = want == text
            print(f"{name}: {'OK' if ok else 'MISMATCH'} {digest[:16]}")
            if not ok:
                failures.append(name)
                with open(path + ".new", "w") as f:
                    f.write(text)
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
