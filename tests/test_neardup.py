"""Streaming MinHash/LSH near-duplicate gate (streaming/neardup.py).

Covers the r5 gate contract: a cross-batch near-duplicate of an earlier
document is dropped exactly once; the drained stream equals the batch
twin (same claims-are-unconditional semantics); bucket state is
watermark-bounded (EventTimeTimeout eviction), so a duplicate arriving
far beyond the horizon is kept — the documented bounded-state trade.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ksql_udaf_statistics_spark.streaming.neardup import (
    duration_to_ms,
    minhash_dedup_batch,
    run_stream_minhash_dedup,
)
from ksql_udaf_statistics_spark.streaming.sink import ExactlyOnceParquetSink

WORDS = [f"w{i}" for i in range(60)]


def _doc(doc_id, ts, words):
    return (doc_id, " ".join(words), ts)


def _near(words, tag):
    # change the last word: ~55/61 shingle Jaccard (~0.9) — collides in
    # at least one of 16 two-row bands with overwhelming probability,
    # and deterministically identical between stream and batch twin
    return words[:-1] + [tag]


SCHEMA = "doc_id string, text string, ts string"


def _stage(spark, tmp_dir, src, batches):
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        staged = os.path.join(tmp_dir, f"stage{i}")
        spark.createDataFrame(rows, SCHEMA).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{i:02d}.parquet"))
        shutil.rmtree(staged)


def _run(spark, tmp_dir, src, watermark="1 hour"):
    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = ExactlyOnceParquetSink(
        os.path.join(tmp_dir, "kept"), key_cols=["doc_id"]
    )
    q = run_stream_minhash_dedup(
        stream, sink, os.path.join(tmp_dir, "ckpt"), watermark=watermark
    )
    q.awaitTermination(180)
    return sink


def test_duration_to_ms():
    assert duration_to_ms("1 hour") == 3_600_000
    assert duration_to_ms("10 minutes") == 600_000
    with pytest.raises(ValueError):
        duration_to_ms("next tuesday")


def test_stream_near_dups_dropped_and_matches_batch_twin(spark, tmp_dir):
    # disjoint word alphabets: rotations of ONE alphabet share almost all
    # 3-shingles (run order is preserved), so unrelated docs must use
    # different vocabularies entirely
    a = WORDS
    b = [f"x{i}" for i in range(55)]
    batch1 = [_doc("a", "2024-01-01 00:00:00", a),
              _doc("b", "2024-01-01 00:01:00", b)]
    batch2 = [_doc("a2", "2024-01-01 00:02:00", _near(a, "xa")),  # near-dup of a
              _doc("c", "2024-01-01 00:03:00", [f"y{i}" for i in range(50)]),
              _doc("b2", "2024-01-01 00:04:00", _near(b, "xb"))]  # near-dup of b
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, [batch1, batch2])

    sink = _run(spark, tmp_dir, src)
    kept = {r["doc_id"] for r in sink.read_current(spark).collect()}
    assert kept == {"a", "b", "c"}  # cross-batch near-dups dropped once

    # drained stream == batch twin (same semantics, same banding)
    batch_docs = spark.createDataFrame(batch1 + batch2, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    twin = {r["doc_id"] for r in minhash_dedup_batch(batch_docs).collect()}
    assert kept == twin


def test_exact_redelivery_dropped_within_batch_and_across(spark, tmp_dir):
    a = WORDS
    batch1 = [_doc("a", "2024-01-01 00:00:00", a),
              _doc("a_dup_same_batch", "2024-01-01 00:00:30", a)]
    batch2 = [_doc("a_dup_next_batch", "2024-01-01 00:01:00", a)]
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, [batch1, batch2])
    sink = _run(spark, tmp_dir, src)
    kept = {r["doc_id"] for r in sink.read_current(spark).collect()}
    assert kept == {"a"}


def test_bucket_state_evicts_past_watermark(spark, tmp_dir):
    """Bounded state: after the watermark passes a bucket's eviction
    timestamp in a batch where the bucket sees no traffic, its state is
    removed — a duplicate arriving later is kept (the documented trade;
    memory stays bounded by the horizon's traffic)."""
    a = WORDS
    other1 = [f"x{i}" for i in range(55)]
    other2 = [f"y{i}" for i in range(50)]
    batches = [
        [_doc("a", "2024-01-01 00:00:00", a)],
        # advances the watermark far past a's buckets' timeout...
        [_doc("d", "2024-01-02 00:00:00", other1)],
        # ...so THIS batch's timeout pass evicts them (no traffic on them)
        [_doc("e", "2024-01-02 00:01:00", other2)],
        # beyond-horizon duplicate: bucket state is gone -> kept
        [_doc("a_late_dup", "2024-01-02 00:02:00", a)],
    ]
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, batches)
    sink = _run(spark, tmp_dir, src, watermark="10 minutes")
    kept = {r["doc_id"] for r in sink.read_current(spark).collect()}
    assert kept == {"a", "d", "e", "a_late_dup"}


def test_stream_dedup_resumes_from_checkpoint(spark, tmp_dir):
    """North-rule checkpoint resume for the stateful gate: a SECOND run
    over the same checkpoint restores the (band,bucket) claim state, so
    a near-dup arriving after the restart is still dropped, and already-
    processed files are not reprocessed."""
    a = WORDS
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, [[_doc("a", "2024-01-01 00:00:00", a)]])
    sink = _run(spark, tmp_dir, src)
    assert {r["doc_id"] for r in sink.read_current(spark).collect()} == {"a"}

    # restart: stage a near-dup + a fresh doc, rerun on the SAME checkpoint
    batch2 = [_doc("a_dup", "2024-01-01 00:05:00", _near(a, "xq")),
              _doc("z", "2024-01-01 00:06:00", [f"z{i}" for i in range(50)])]
    staged = os.path.join(tmp_dir, "stage_resume")
    spark.createDataFrame(batch2, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(staged)
    part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(src, "99.parquet"))

    sink2 = _run(spark, tmp_dir, src)  # same checkpoint + sink paths
    kept = {r["doc_id"] for r in sink2.read_current(spark).collect()}
    assert kept == {"a", "z"}  # a_dup dropped via RESTORED bucket state
    # resume processed only the new file: batch ids advanced, no replay
    batches = sink2.committed_batches()
    assert len(batches) >= 2


def test_streaming_curation_pipeline(spark, tmp_dir):
    """Ingest-time curation composed in ONE streaming query: stateless
    quality filter -> minhash gate (exact duplicates need no separate
    stage — identical texts have identical signatures, so every band
    collides). Kept set equals the composed batch twin."""
    from ksql_udaf_statistics_spark.operators.text import quality_score

    good = WORDS * 3  # long + stopword-free? ensure quality>=0.5
    # quality_score wants stopwords + length; build a passing doc
    passing = (["the", "a", "of", "to", "in"] * 8 + WORDS) * 2
    low_quality = ["zz"]  # short, no stopwords -> fails
    batch1 = [_doc("p1", "2024-01-01 00:00:00", passing),
              _doc("junk", "2024-01-01 00:00:30", low_quality)]
    batch2 = [_doc("p1_exact", "2024-01-01 00:01:00", passing),   # exact dup
              _doc("p1_near", "2024-01-01 00:02:00", _near(passing, "zq")),
              _doc("p2", "2024-01-01 00:03:00",
                   ["and", "or", "is", "it", "the"] * 12
                   + [f"q{i}" for i in range(40)])]
    src = os.path.join(tmp_dir, "src")
    _stage(spark, tmp_dir, src, [batch1, batch2])

    from ksql_udaf_statistics_spark.streaming.neardup import (
        run_stream_minhash_dedup,
    )

    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(quality_score(F.col("text")) >= 0.5)
    )
    sink = ExactlyOnceParquetSink(os.path.join(tmp_dir, "kept"), ["doc_id"])
    q = run_stream_minhash_dedup(stream, sink, os.path.join(tmp_dir, "ckpt"))
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in sink.read_current(spark).collect()}
    assert kept == {"p1", "p2"}  # junk filtered, exact+near dups gated

    batch_docs = spark.createDataFrame(batch1 + batch2, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).filter(quality_score(F.col("text")) >= 0.5)
    twin = {r["doc_id"] for r in minhash_dedup_batch(batch_docs).collect()}
    assert kept == twin


SRC_SCHEMA = "doc_id string, source string, text string, ts string"


def _sdoc(doc_id, source, ts, words):
    return (doc_id, source, " ".join(words), ts)


def test_streaming_curation_funnel(spark, tmp_dir):
    """Directive-#8 capstone: ONE streaming query maintains BOTH curated
    corpus (kept table) and per-source funnel counts (second EMIT CHANGES
    table) across micro-batches; the drained funnel equals the batch twin
    exactly (counts AND kept-set)."""
    from ksql_udaf_statistics_spark.streaming.funnel import (
        curation_funnel_batch_twin,
        read_funnel_table,
        run_stream_curation_funnel,
    )

    passing = (["the", "a", "of", "to", "in"] * 8 + WORDS) * 2
    other = (["and", "or", "is", "it", "the"] * 12
             + [f"q{i}" for i in range(40)])
    batch1 = [
        _sdoc("a", "web", "2024-01-01 00:00:00", passing),
        _sdoc("junk1", "web", "2024-01-01 00:00:10", ["zz"]),
        _sdoc("b", "books", "2024-01-01 00:01:00", other),
    ]
    batch2 = [
        _sdoc("a_exact", "web", "2024-01-01 00:02:00", passing),
        _sdoc("a_near", "wiki", "2024-01-01 00:03:00", _near(passing, "xq")),
        _sdoc("junk2", "books", "2024-01-01 00:03:30", ["yy", "qq"]),
        _sdoc("c", "wiki", "2024-01-01 00:04:00",
              (["the", "of", "and", "to", "it"] * 10
               + [f"r{i}" for i in range(45)])),
    ]
    src = os.path.join(tmp_dir, "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate([batch1, batch2]):
        staged = os.path.join(tmp_dir, f"sstage{i}")
        spark.createDataFrame(rows, SRC_SCHEMA).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{i:02d}.parquet"))
        shutil.rmtree(staged)

    stream = spark.readStream.schema(
        "doc_id string, source string, text string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    kept_sink = ExactlyOnceParquetSink(
        os.path.join(tmp_dir, "kept"), ["doc_id"])
    funnel_sink = ExactlyOnceParquetSink(
        os.path.join(tmp_dir, "funnel"), ["source"])
    q = run_stream_curation_funnel(
        stream, kept_sink, funnel_sink, os.path.join(tmp_dir, "ckpt"))
    assert q.awaitTermination(240)

    kept = {r["doc_id"] for r in kept_sink.read_current(spark).collect()}
    # junk fails quality; a_exact shares every band bucket with a;
    # a_near collides in >=1 band; b and c are distinct survivors
    assert kept == {"a", "b", "c"}

    funnel = {
        r["source"]: (r["n_docs"], r["n_quality"], r["n_kept"],
                      r["tokens_kept"])
        for r in read_funnel_table(funnel_sink, spark).collect()
    }
    all_docs = spark.createDataFrame(batch1 + batch2, SRC_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    twin = {
        r["source"]: (r["n_docs"], r["n_quality"], r["n_kept"],
                      r["tokens_kept"])
        for r in curation_funnel_batch_twin(all_docs).collect()
    }
    assert funnel == twin
    # spot-check the absolute shape, not just parity: web saw 3 docs
    # (a, junk1, a_exact), 2 quality, 1 kept
    assert funnel["web"][0] == 3 and funnel["web"][1] == 2
    assert funnel["web"][2] == 1
    # funnel table was maintained incrementally: both batches committed
    assert len(funnel_sink.committed_batches()) >= 2


def test_streaming_curation_funnel_resume(spark, tmp_dir):
    """Checkpoint-resume: restart after draining batch 1, deliver batch 2,
    and the funnel counts stay additive-exact (no double count of batch-1
    docs, replay-safe base read)."""
    from ksql_udaf_statistics_spark.streaming.funnel import (
        curation_funnel_batch_twin,
        read_funnel_table,
        run_stream_curation_funnel,
    )

    passing = (["the", "a", "of", "to", "in"] * 8 + WORDS) * 2
    batch1 = [_sdoc("a", "web", "2024-01-01 00:00:00", passing),
              _sdoc("junk1", "web", "2024-01-01 00:00:10", ["zz"])]
    batch2 = [_sdoc("a_near", "web", "2024-01-01 00:05:00",
                    _near(passing, "xq")),
              _sdoc("z", "books", "2024-01-01 00:06:00",
                    (["the", "of", "and", "to", "it"] * 10
                     + [f"z{i}" for i in range(45)]))]
    src = os.path.join(tmp_dir, "src")
    os.makedirs(src, exist_ok=True)

    def stage(i, rows):
        staged = os.path.join(tmp_dir, f"rstage{i}")
        spark.createDataFrame(rows, SRC_SCHEMA).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{i:02d}.parquet"))
        shutil.rmtree(staged)

    def run():
        stream = spark.readStream.schema(
            "doc_id string, source string, text string, ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        kept_sink = ExactlyOnceParquetSink(
            os.path.join(tmp_dir, "kept"), ["doc_id"])
        funnel_sink = ExactlyOnceParquetSink(
            os.path.join(tmp_dir, "funnel"), ["source"])
        q = run_stream_curation_funnel(
            stream, kept_sink, funnel_sink, os.path.join(tmp_dir, "ckpt"))
        assert q.awaitTermination(240)
        return kept_sink, funnel_sink

    stage(0, batch1)
    run()
    stage(1, batch2)
    kept_sink, funnel_sink = run()  # same checkpoint: resumes, no replay

    kept = {r["doc_id"] for r in kept_sink.read_current(spark).collect()}
    assert kept == {"a", "z"}  # a_near dropped via restored bucket state
    funnel = {
        r["source"]: (r["n_docs"], r["n_quality"], r["n_kept"],
                      r["tokens_kept"])
        for r in read_funnel_table(funnel_sink, spark).collect()
    }
    all_docs = spark.createDataFrame(batch1 + batch2, SRC_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    twin = {
        r["source"]: (r["n_docs"], r["n_quality"], r["n_kept"],
                      r["tokens_kept"])
        for r in curation_funnel_batch_twin(all_docs).collect()
    }
    assert funnel == twin
    assert funnel["web"] == (3, 2, 1, twin["web"][3])
