"""Streaming drift detector (streaming/drift.py).

The hash parity of the drained stream against the batch query's DuckDB
oracle is covered by the oracle harness (gate entry
``drift_detector_stream`` shares ``drift_detector_events``'s oracle
verbatim). These tests cover the operator-level behaviors that parity
alone doesn't witness: the drift flag firing on a constructed outlier,
EventTimeTimeout finalization of a key with no fresh traffic, and
exactly-once checkpoint resume.
"""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from ksql_udaf_statistics_spark.streaming.drift import (
    run_stream_drift_detector,
)

SCHEMA = "event_type string, ts string, value double"
READ_SCHEMA = "event_type string, ts timestamp, value double"


def _stage(spark, tmp_dir, src, batches):
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - 3600
    for i, rows in enumerate(batches):
        staged = os.path.join(tmp_dir, f"stage{i}")
        spark.createDataFrame(rows, SCHEMA).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (t0 + i, t0 + i))
        shutil.rmtree(staged)


def _run(spark, tmp_dir, src, out="out", ckpt="ckpt", **kw):
    stream = (
        spark.readStream.schema(READ_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_drift_detector(
        stream, os.path.join(tmp_dir, out), os.path.join(tmp_dir, ckpt),
        watermark="1 hour", **kw,
    )
    return spark.read.parquet(os.path.join(tmp_dir, out))


def _hours(base_day, spec):
    """spec: list of (hour, value) -> event rows for one key."""
    return [
        ("a", f"{base_day} {h:02d}:30:00", v) for h, v in spec
    ]


def test_drift_flag_fires_on_outlier(spark, tmp_dir):
    # 14 calm windows alternating 10/12 (nonzero baseline variance), then
    # one wild window at 1000 -> |z| >> 3 -> flagged; the calm window
    # after it is not.
    calm = [(h, 10.0 if h % 2 == 0 else 12.0) for h in range(14)]
    rows = _hours("2024-01-01", calm + [(14, 1000.0), (15, 11.0)])
    flush = [("f", "2024-01-02 12:00:00", 0.0), ("f", "2024-01-03 00:00:00", 0.0)]
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, [rows[:8], rows[8:], [flush[0]], [flush[1]]])
    out = _run(spark, tmp_dir, src)
    got = {
        r["ws_ms"]: r
        for r in out.where("key = 'a' and n_baseline >= 12").collect()
    }
    base = 1704067200000  # 2024-01-01 00:00:00 UTC
    hr = 3_600_000
    outlier = got[base + 14 * hr]
    assert outlier["is_drift"] == 1 and abs(outlier["z_score"]) > 3
    assert outlier["n_baseline"] == 14
    calm_after = got[base + 15 * hr]
    assert calm_after["is_drift"] == 0
    # baseline absorbed the outlier -> inflated std, documented behavior
    assert calm_after["n_baseline"] == 15


def test_quiet_key_finalizes_via_timeout(spark, tmp_dir):
    # key 'a' only sends in hours 0-2, then goes quiet; key 'b' keeps the
    # watermark moving. a's windows must still finalize (EventTimeTimeout
    # fires its state handler with no input rows for 'a').
    a_rows = _hours("2024-01-01", [(0, 1.0), (1, 2.0), (2, 3.0)])
    b1 = [("b", "2024-01-01 06:00:00", 5.0)]
    b2 = [("b", "2024-01-01 12:00:00", 5.0)]
    b3 = [("b", "2024-01-01 18:00:00", 5.0)]
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, [a_rows, b1, b2, b3])
    out = _run(spark, tmp_dir, src)
    a_windows = sorted(
        r["ws_ms"] for r in out.where("key = 'a'").collect()
    )
    base = 1704067200000
    hr = 3_600_000
    assert a_windows == [base, base + hr, base + 2 * hr]


def test_checkpoint_resume_is_exactly_once(spark, tmp_dir):
    calm = [(h, 10.0 if h % 2 == 0 else 12.0) for h in range(16)]
    rows = _hours("2024-01-01", calm)
    flush = [("f", "2024-01-02 12:00:00", 0.0), ("f", "2024-01-03 00:00:00", 0.0)]
    batches = [rows[:6], rows[6:11], rows[11:], [flush[0]], [flush[1]]]

    # one-shot reference
    src_full = os.path.join(tmp_dir, "src_full")
    _stage(spark, tmp_dir, src_full, batches)
    ref = _run(spark, tmp_dir, src_full, out="out_full", ckpt="ckpt_full")
    ref_rows = sorted(map(tuple, ref.where("key = 'a'").collect()))

    # interrupted run: first two files, drain, then the rest resumes from
    # the same checkpoint
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, batches[:2])
    _run(spark, tmp_dir, src)
    _stage(spark, tmp_dir, src, batches)  # idempotent filenames 00..04
    out = _run(spark, tmp_dir, src)
    got_rows = sorted(map(tuple, out.where("key = 'a'").collect()))
    assert got_rows == ref_rows
    # no window emitted twice
    ws = [r[1] for r in got_rows]
    assert len(ws) == len(set(ws))


def test_partial_prereduction_bounds_handler_input(spark):
    """r7 optimization contract (VERDICT r6 #2): raw events never reach
    the stateful operator. (a) The plan places the stateless MapInPandas
    pre-reduction BELOW FlatMapGroupsInPandasWithState; (b) the reducer
    emits exactly one partial per (key, window) per partition — with the
    exact decimal sum the per-row accumulation produced — so handler
    input is O(#keys x #windows x #partitions) per batch, not O(events).
    """
    import numpy as np
    import pandas as pd
    from decimal import Decimal

    from ksql_udaf_statistics_spark.streaming.drift import (
        _dec12, reduce_event_partials, stream_drift_decisions,
    )

    # (a) plan shape on a real streaming source
    stream = (
        spark.readStream.schema(READ_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet("/root/testdata")  # never started; plan-only
    )
    plan = stream_drift_decisions(stream)._jdf.queryExecution().analyzed().toString()
    i_state = plan.index("FlatMapGroupsInPandasWithState")
    i_reduce = plan.index("reduce_event_partials")
    assert i_reduce > i_state  # deeper in the tree = below the state op

    # (b) 10k events, 2 keys x 3 windows -> 6 partial rows, exact sums
    rng = np.random.default_rng(7)
    n = 10_000
    keys = np.where(rng.random(n) < 0.5, "a", "b")
    ws = rng.integers(0, 3, n) * 3_600_000
    vals = rng.normal(100.0, 15.0, n)
    vals[::97] = np.nan  # NULL/NaN rows: counted in p_rows, not p_val
    pdf = pd.DataFrame(
        {
            "key": keys,
            "ws_ms": ws,
            "value": vals,
            "ts": pd.to_datetime(ws + 1800_000, unit="ms"),
        }
    )
    out = pd.concat(list(reduce_event_partials(iter([pdf]))))
    assert len(out) == 6  # one partial per (key, window), not 10k rows
    assert int(out["p_rows"].sum()) == n
    for _, r in out.iterrows():
        seg = pdf[(pdf["key"] == r["key"]) & (pdf["ws_ms"] == r["ws_ms"])]["value"]
        valid = seg[seg == seg]
        assert int(r["p_val"]) == len(valid)
        want = sum((_dec12(float(v)) for v in valid), Decimal(0))
        assert Decimal(r["p_s1"]) == want
