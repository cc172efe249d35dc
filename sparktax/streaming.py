"""Structured-Streaming transcript ingest (optional lane; the reference is
pure batch — SURVEY §2.11).

``stream_extract_triples`` applies the same zero-copy Arrow extraction to a
transcript stream: the extraction is stateless per turn, so it composes
with ``readStream`` directly (no watermark needed for extraction itself;
late data only matters for *aggregations* downstream). ``ingest_to_graph``
lands micro-batches through ``foreachBatch`` into the batch pipeline's
checkpointed tables — the canonical "stream in, batch semantics out"
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sparktax import schemas
from sparktax.extract import extract_triples


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of transcript parquet drops (Iceberg/Kafka on a
    real cluster — same downstream code)."""
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_extract_triples(transcripts: DataFrame) -> DataFrame:
    """Streaming DF of (conv_id, turn_idx, subj, pred, obj) — the Arrow
    extraction kernel runs unchanged on each micro-batch."""
    return extract_triples(transcripts)


def windowed_statement_counts(
    transcripts: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-window triple production rate with late-data handling: watermark
    on ``ts``, tumbling window aggregation (the streaming-agg pattern the
    100 TB ingest dashboard needs)."""
    # watermark must be (re)applied AFTER the Arrow map — mapInArrow drops
    # event-time metadata from the plan
    triples = extract_triples_with_ts(transcripts).withWatermark("ts", watermark)
    return triples.groupBy(
        F.window("ts", window).alias("w"), "pred"
    ).agg(F.count("*").alias("n_triples"))


def extract_triples_with_ts(transcripts: DataFrame) -> DataFrame:
    """Extraction that carries ``ts`` through the Arrow kernel as a
    passthrough column — no stream-stream join, so it stays a stateless
    map over the stream."""
    return extract_triples(transcripts, passthrough=("ts",))


def ingest_to_graph(
    transcripts: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """foreachBatch sink: each micro-batch's extracted triples append to
    the raw-triples table (downstream encode/canonicalize runs as the
    batch pipeline on the accumulated table)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        extract_triples(batch_df).withColumn(
            "_batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(f"{out_dir}/raw_triples")

    writer = (
        transcripts.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
