"""Structured-Streaming ingest: file-source stream → extraction →
foreachBatch sink; windowed statement counts with watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparktax import synth
from sparktax.streaming import (
    extract_triples_with_ts,
    ingest_to_graph,
    read_transcript_stream,
    stream_extract_triples,
    windowed_statement_counts,
)


@pytest.fixture()
def transcript_drop(spark, tmp_path):
    pdf, gold = synth.gen_transcripts_pdf(n_convs=40, seed=21)
    path = str(tmp_path / "drops")
    # two file drops
    half = len(pdf) // 2
    synth.transcripts_to_spark(spark, pdf.iloc[:half]).write.mode("overwrite").parquet(path)
    synth.transcripts_to_spark(spark, pdf.iloc[half:]).write.mode("append").parquet(path)
    return path, pdf, gold


def test_stream_ingest_foreachbatch(spark, tmp_path, transcript_drop):
    path, pdf, gold = transcript_drop
    stream = read_transcript_stream(spark, path, max_files_per_trigger=1)
    assert stream.isStreaming
    out_dir = str(tmp_path / "out")
    q = ingest_to_graph(
        stream, out_dir, checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out_dir}/raw_triples")
    assert got.count() == len(gold)
    # restart with no new data → no duplicates (exactly-once via checkpoint)
    q2 = ingest_to_graph(
        read_transcript_stream(spark, path),
        out_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/raw_triples").count() == len(gold)


def test_windowed_counts_memory_sink(spark, transcript_drop):
    path, pdf, gold = transcript_drop
    stream = read_transcript_stream(spark, path)
    agg = windowed_statement_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; just assert the query ran and
    # the schema is right
    got = spark.sql("select * from wincounts")
    assert set(got.columns) == {"w", "pred", "n_triples"}


def test_stateful_contextual_across_batches(spark, tmp_path):
    """applyInPandasWithState coref: a pronoun arriving in batch 2 resolves
    to the explicit subject seen in batch 1 — per-conversation GroupState
    survives across micro-batches. Output must equal the batch-lane window
    forward-fill on the concatenated input."""
    import os
    import time

    import pandas as pd

    from sparktax.extract import extract_triples_contextual
    from sparktax.streaming import stream_contextual_triples

    def mk(rows):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
        )
        pdf["ts"] = pd.Timestamp("2026-01-01")
        return pdf

    drop1 = mk(
        [
            ("c1", 0, "user", "well Alice_X works_at Acme_Corp. ok", ""),
            ("c2", 0, "user", "note It works_at Nowhere_Inc. hm", ""),  # unresolvable
        ]
    )
    drop2 = mk(
        [
            ("c1", 1, "user", "then It works_at Globex_Inc. done", ""),
            ("c2", 1, "user", "and Bob_Y located_in Paris_FR. yes", ""),
        ]
    )
    path = str(tmp_path / "drops")
    synth.transcripts_to_spark(spark, drop1).coalesce(1).write.mode("overwrite").parquet(path)
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    synth.transcripts_to_spark(spark, drop2).coalesce(1).write.mode("append").parquet(path)

    stream = read_transcript_stream(spark, path, max_files_per_trigger=1)
    out = stream_contextual_triples(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("coref")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from coref").toPandas()
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    got = got.sort_values(key, kind="mergesort").reset_index(drop=True)

    both = pd.concat([drop1, drop2], ignore_index=True)
    want = (
        extract_triples_contextual(synth.transcripts_to_spark(spark, both))
        .toPandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[key], want[key], check_dtype=False)
    # the cross-batch resolution really happened
    assert ("c1", 1, "Alice_X", "works_at", "Globex_Inc") in set(
        map(tuple, got[key].itertuples(index=False))
    )

    # TTL variant (processing-time idle timeout): same output while the
    # conversations stay active inside the window
    q2 = (
        stream_contextual_triples(
            read_transcript_stream(spark, path, max_files_per_trigger=1),
            state_ttl_ms=3_600_000,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("coref_ttl")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = (
        spark.sql("select * from coref_ttl")
        .toPandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2[key], want[key], check_dtype=False)


def test_stream_dedup_drops_redelivered_turns(spark, tmp_path):
    """At-least-once redelivery: the same file content lands twice (two
    drops); watermarked streaming dedup emits each triple once."""
    import time

    from sparktax.streaming import stream_dedup_triples

    pdf, gold = synth.gen_transcripts_pdf(n_convs=10, seed=31)
    path = str(tmp_path / "drops")
    synth.transcripts_to_spark(spark, pdf).coalesce(1).write.mode("overwrite").parquet(path)
    time.sleep(1.1)
    synth.transcripts_to_spark(spark, pdf).coalesce(1).write.mode("append").parquet(path)

    out = stream_dedup_triples(
        read_transcript_stream(spark, path, max_files_per_trigger=1)
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedupstream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select conv_id, turn_idx, subj, pred, obj from dedupstream"
    ).toPandas()
    assert len(got) == len(gold)  # not 2 × gold
    assert not got.duplicated().any()


def test_extract_with_ts_passthrough(spark, transcript_drop):
    path, pdf, gold = transcript_drop
    batch = spark.read.parquet(path)
    got = extract_triples_with_ts(batch)
    assert "ts" in got.columns
    row = got.first()
    assert row["ts"] is not None
    assert got.count() == len(gold)
