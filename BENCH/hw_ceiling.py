#!/usr/bin/env python
"""Measure this host's pure-CPU N->4N scaling ceiling.

Spark-free multiprocessing busy-loops: whatever ratio the host gives HERE
is the maximum any compute-bound job can show. Emits one JSON line used by
report_scaling.py to contextualize the measured Spark efficiency.
"""
import json, multiprocessing as mp, sys, time

import numpy as np

def memburn(_):
    # memory-bandwidth-bound: stream 400MB per task through the FPU
    a = np.ones(50_000_000, dtype=np.float64)
    s = 0.0
    for _ in range(2):
        s += float(a.sum())
    return s

def burn(_):
    x = 0
    for i in range(30_000_000):
        x += i * i
    return x

def measure(n, fn=burn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        with mp.Pool(n) as p:
            p.map(fn, range(n * 3))  # 3 waves: averages scheduling
        dt = time.perf_counter() - t0
        thr = n * 3 / dt
        best = max(best or 0, thr)
    return best

if __name__ == "__main__":
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t_small = measure(n_small)
    t_big = measure(n_big)
    m_small = measure(n_small, memburn)
    m_big = measure(n_big, memburn)
    print(json.dumps({
        "n_small": n_small, "n_big": n_big,
        "tasks_per_sec_small": round(t_small, 3),
        "tasks_per_sec_big": round(t_big, 3),
        "hw_ceiling_efficiency": round((t_big / t_small) / (n_big / n_small), 4),
        "mem_tasks_per_sec_small": round(m_small, 3),
        "mem_tasks_per_sec_big": round(m_big, 3),
        "mem_bandwidth_ceiling_efficiency": round((m_big / m_small) / (n_big / n_small), 4),
    }))
