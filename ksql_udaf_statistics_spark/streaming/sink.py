"""Exactly-once sinks for streaming aggregates (parquet stand-in for Iceberg).

The reference materializes its continuous aggregate into a Kafka changelog
topic (AllUdafIT.java:593-600); ksqlDB's state store + changelog give it
effective exactly-once. Our equivalent (north_rule): ``foreachBatch``
writing an idempotent, replay-safe table.

Mechanism — **overwrite-by-batch-partition**:

- every micro-batch writes its rows under ``batch_id=<N>`` using dynamic
  partition overwrite, so a replayed batch (after a crash between "write"
  and "commit offsets") overwrites its own partition with identical
  content instead of duplicating — idempotence without a transaction log;
- with update-mode aggregations the same (window, key) may be re-emitted
  in later batches; ``read_current`` resolves to the latest batch per key
  (row_number over batch_id desc) — the parquet analogue of an Iceberg
  MERGE keyed by (window, source), SURVEY.md §7 substitution note;
- a ``_ledger`` directory records committed batch ids + row counts +
  partition lineage, giving per-partition lineage/metrics (north_rule)
  and a cheap audit that replays happened.

On a real cluster the same class swaps parquet for Iceberg by replacing
``_write_batch`` with a MERGE INTO — the foreachBatch topology, checkpoint
contract, and key discipline are unchanged.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class ExactlyOnceParquetSink:
    """foreachBatch sink with batch-id idempotence + key-upsert reads."""

    def __init__(self, path: str, key_cols: Sequence[str],
                 coalesce_output: Optional[int] = 1):
        self.path = path
        self.key_cols = list(key_cols)
        self.ledger_dir = os.path.join(path, "_ledger")
        # windowed-aggregate outputs are tiny (one row per (window, key));
        # writing them as shuffle-partition-many files per batch just adds
        # file-creation latency and listing pressure on the sink table
        self.coalesce_output = coalesce_output

    # -- write side ---------------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._write_batch(batch_df, batch_id)

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # two actions follow (write + lineage); without a cache each action
        # re-executes the whole micro-batch plan including the stateful
        # aggregation — measured 2x addBatch cost at the bench
        batch_df.persist()
        try:
            out = batch_df.withColumn("batch_id", F.lit(batch_id))
            if self.coalesce_output:
                out = out.coalesce(self.coalesce_output)
            (
                out.write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(os.path.join(self.path, "data"))
            )
            # per-partition lineage: rows contributed by each partition
            lineage = [
                {"partition": int(r["p"]), "rows": int(r["n"])}
                for r in batch_df.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]
        finally:
            batch_df.unpersist()
        os.makedirs(self.ledger_dir, exist_ok=True)
        entry = {
            "batch_id": batch_id,
            "rows": sum(x["rows"] for x in lineage),
            "partitions": lineage,
            "wall_time": time.time(),
        }
        # one file per batch id: replays overwrite the same file -> idempotent
        with open(os.path.join(self.ledger_dir, f"batch-{batch_id:012d}.json"), "w") as f:
            json.dump(entry, f)

    # -- read side ----------------------------------------------------------

    def read_all(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "data"))

    def read_current(self, spark: SparkSession) -> DataFrame:
        """Latest emission per key — the materialized-table ("pull query")
        view (AllUdafIT.java:654-671).

        Only COMMITTED batches (present in the ledger) are served: a batch
        directory written by a crash between data-write and ledger-commit
        is invisible until its replay commits — the ledger is the source
        of truth for what exists, exactly like an Iceberg snapshot list.
        """
        df = self.read_all(spark)
        committed = [e["batch_id"] for e in self.committed_batches()]
        if not committed:
            return df.filter(F.lit(False)).drop("batch_id")
        # exact ledger intersection: only directories with a ledger entry
        # are served (a crashed batch's directory is invisible whatever its
        # id). Large committed lists compile to an InSet over the batch_id
        # partition column — still partition-pruned, O(1) per-row
        df = df.filter(F.col("batch_id").isin(committed))
        w = Window.partitionBy(*self.key_cols).orderBy(F.col("batch_id").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "batch_id")
        )

    def read_latest_batch(self, spark: SparkSession) -> DataFrame:
        """Rows of the most recent COMMITTED batch ONLY.

        Required for COMPLETE-output-mode queries (session windows): each
        batch re-emits the ENTIRE aggregate, so the latest batch IS the
        table. Resolving latest-per-key across batches (read_current) is
        wrong there — a session merged away by a later batch would still
        surface its pre-merge row from an earlier batch (phantom stale
        rows). batch_id is the partition column, so the filter prunes to
        one partition directory.

        "Committed" means present in the ledger: a data directory written
        by a batch that crashed before its ledger commit is never served
        (it will be overwritten identically on replay, and only then
        becomes visible). An empty ledger yields an empty table, not the
        newest uncommitted directory.
        """
        df = self.read_all(spark)
        entries = self.committed_batches()
        if not entries:
            return df.filter(F.lit(False)).drop("batch_id")
        latest = max(e["batch_id"] for e in entries)
        return df.filter(F.col("batch_id") == latest).drop("batch_id")

    def committed_batches(self) -> list[dict]:
        if not os.path.isdir(self.ledger_dir):
            return []
        entries = []
        for name in sorted(os.listdir(self.ledger_dir)):
            if name.startswith("batch-") and name.endswith(".json"):
                with open(os.path.join(self.ledger_dir, name)) as f:
                    entries.append(json.load(f))
        return entries


class MergeUpsertParquetSink(ExactlyOnceParquetSink):
    """foreachBatch sink with true key-level MERGE semantics.

    Where :class:`ExactlyOnceParquetSink` appends batch partitions and
    resolves the latest row per key at READ time, this sink maintains the
    merged table at WRITE time — the parquet analogue of Iceberg's
    ``MERGE INTO target USING batch ON keys WHEN MATCHED UPDATE``
    (SURVEY.md §7): after every batch the stored table holds exactly one
    row per key.

    Snapshot-and-pointer commit (the Iceberg snapshot model in one file):

    - each batch writes a full new snapshot directory
      ``snapshot=<batch_id>`` = (previous snapshot minus keys present in
      the batch) union (batch rows);
    - a ``_current`` pointer file is then replaced atomically
      (``os.replace``). A crash before the repoint leaves the previous
      snapshot live; a replayed batch rewrites the same snapshot from the
      same previous state and repoints — idempotent, exactly-once.

    Cost shape: a full-table rewrite per batch. That is the right trade
    for a materialized *aggregate* (O(windows x keys) rows, tiny next to
    the input stream); a real Iceberg MERGE avoids the rewrite via
    file-level pruning, and swapping this class for it changes only
    ``_write_batch`` — the foreachBatch topology, checkpoint contract and
    key discipline are identical.
    """

    def _snapshot_dir(self, batch_id: int) -> str:
        return os.path.join(self.path, "data", f"snapshot={batch_id:012d}")

    def _pointer_file(self) -> str:
        return os.path.join(self.path, "_current")

    def _current_snapshot(self) -> Optional[str]:
        try:
            with open(self._pointer_file()) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            # one row per key within the batch (update-mode re-emissions of
            # the same key in one batch collapse to the last state, which
            # for our monotone accumulators equals max of every stat column;
            # rows within a foreachBatch df for one key are identical)
            new = batch_df.dropDuplicates(self.key_cols)
            cur_name = self._current_snapshot()
            # a replayed batch must merge against the state BEFORE itself,
            # not its own output, or deletes-by-overwrite double-apply
            if cur_name is not None and int(cur_name.split("=")[1]) == batch_id:
                committed = [
                    e["batch_id"] for e in self.committed_batches()
                    if e["batch_id"] < batch_id
                ]
                cur_name = (
                    f"snapshot={max(committed):012d}" if committed else None
                )
            if cur_name is not None:
                cur = spark.read.parquet(
                    os.path.join(self.path, "data", cur_name)
                )
                keep = cur.join(
                    F.broadcast(new.select(*self.key_cols)),
                    self.key_cols,
                    "left_anti",
                )
                out = keep.unionByName(new.select(*cur.columns))
            else:
                out = new
            if self.coalesce_output:
                out = out.coalesce(self.coalesce_output)
            out.write.mode("overwrite").parquet(self._snapshot_dir(batch_id))
            lineage = [
                {"partition": int(r["p"]), "rows": int(r["n"])}
                for r in batch_df.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]
        finally:
            batch_df.unpersist()
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"snapshot={batch_id:012d}")
        os.replace(tmp, self._pointer_file())
        os.makedirs(self.ledger_dir, exist_ok=True)
        entry = {
            "batch_id": batch_id,
            "rows": sum(x["rows"] for x in lineage),
            "partitions": lineage,
            "wall_time": time.time(),
        }
        with open(
            os.path.join(self.ledger_dir, f"batch-{batch_id:012d}.json"), "w"
        ) as f:
            json.dump(entry, f)

    def read_all(self, spark: SparkSession) -> DataFrame:
        cur = self._current_snapshot()
        if cur is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        return spark.read.parquet(os.path.join(self.path, "data", cur))

    def read_current(self, spark: SparkSession) -> DataFrame:
        # the table IS the merged state — no read-time resolution needed
        return self.read_all(spark)

    # -- time travel ---------------------------------------------------------

    def snapshots(self) -> list[int]:
        """Committed snapshot ids (batch ids), oldest first — Iceberg's
        snapshot log. Only snapshots at or before the current pointer
        count as committed (a crash can leave a newer orphan directory,
        which a replay overwrites)."""
        cur = self._current_snapshot()
        if cur is None:
            return []
        cur_id = int(cur.split("=")[1])
        data = os.path.join(self.path, "data")
        out = []
        for name in os.listdir(data):
            if name.startswith("snapshot="):
                sid = int(name.split("=")[1])
                if sid <= cur_id:
                    out.append(sid)
        return sorted(out)

    def read_as_of(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """Time-travel read: the merged table as of the latest committed
        snapshot with id <= ``batch_id`` (Iceberg ``VERSION AS OF``).
        Every snapshot is a full consistent table, so this is just a
        different directory scan — no reconstruction."""
        eligible = [s for s in self.snapshots() if s <= batch_id]
        if not eligible:
            raise FileNotFoundError(
                f"no committed snapshot at or before batch {batch_id} "
                f"under {self.path}"
            )
        return spark.read.parquet(
            os.path.join(self.path, "data", f"snapshot={max(eligible):012d}")
        )


def run_streaming_stats(
    source_df: DataFrame,
    sink: ExactlyOnceParquetSink,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "update",
    available_now: bool = True,
    trigger_interval: Optional[str] = None,
    query_name: str = "windowed_stats",
):
    """Wire source → transform → exactly-once sink with a checkpoint.

    ``availableNow`` drains all currently-available input then stops —
    used by tests and the bench for bounded runs; a kill/restart with the
    same checkpoint resumes from the last committed offsets (north_rule
    checkpoint-resume requirement).
    """
    agg = transform(source_df)
    writer = (
        agg.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def drain_available_now(query, timeout_sec: Optional[int], what: str):
    """Block until an ``availableNow`` query finishes draining, stopping
    it and raising if ``timeout_sec`` elapses first. The one shared
    timeout policy for every bounded streaming runner (drift, continuous
    aggregates, gates) — keep drain-timeout tuning here, not in copies.
    """
    if timeout_sec is not None:
        if not query.awaitTermination(timeout_sec):
            query.stop()
            raise RuntimeError(f"{what} did not drain within {timeout_sec}s")
    return query
