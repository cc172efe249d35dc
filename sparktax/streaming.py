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


def stream_contextual_triples(
    transcripts: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Cross-batch pronoun coreference: a custom stateful operator via
    ``applyInPandasWithState`` keyed by ``conv_id``.

    The batch lane resolves pronouns with a window forward-fill
    (:func:`sparktax.extract.extract_triples_contextual`); a stream cannot
    window over unbounded history, so the per-conversation "most recent
    explicit subject" lives in GroupState and survives across micro-batches
    (a pronoun in batch N resolves to a subject last seen in batch N−k).

    Contract: turns of one conversation arrive in ``turn_idx`` order across
    batches (the standard Kafka key=conv_id guarantee); within a batch any
    order is fine (sorted before resolution). Unresolvable pronoun
    statements (no explicit subject seen yet) are dropped, matching the
    batch lane. Resolution inside a batch is a vectorized pandas
    forward-fill, not a per-row loop.

    ``state_ttl_ms`` (milliseconds): processing-time idle timeout — a
    conversation silent for that long drops its state row. Without it the
    state store holds one row per conversation EVER seen, which at
    10¹²-turn scale is an unbounded-state leak; with it, state is bounded
    by the number of conversations active within the TTL window.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sparktax.extract import extract_triples
    from sparktax.extract.rules import PRONOUNS

    ex = extract_triples(transcripts, keep_pronouns=True, with_stmt_idx=True)
    out_schema = "conv_id string, turn_idx int, subj string, pred string, obj string"
    state_schema = "last_subj string"
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    pron = sorted(PRONOUNS)

    def resolve(key, pdfs, state):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["turn_idx", "stmt_idx"], kind="mergesort")
            explicit = pdf["subj"].where(~pdf["subj"].isin(pron))
            resolved = explicit.ffill()
            if last is not None:
                resolved = resolved.fillna(last)
            nonnull = explicit.dropna()
            if len(nonnull):
                last = nonnull.iloc[-1]
            out = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "subj": resolved,
                    "pred": pdf["pred"],
                    "obj": pdf["obj"],
                }
            )
            yield out[out["subj"].notna()][cols]
        if last is not None:
            state.update((last,))
        if state_ttl_ms is not None and state.exists:
            state.setTimeoutDuration(int(state_ttl_ms))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return ex.groupBy("conv_id").applyInPandasWithState(
        resolve, out_schema, state_schema, "append", timeout
    )


def stream_dedup_triples(
    transcripts: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup: at-least-once sources (Kafka replays, file
    redelivery) emit duplicate turns; drop re-extracted triples whose key
    (conv_id, turn_idx, subj, pred, obj) was already seen within the
    watermark horizon. State is bounded by the horizon —
    ``dropDuplicatesWithinWatermark`` evicts keys once the event-time
    watermark passes them (the unbounded-state-safe streaming dedup)."""
    triples = extract_triples(transcripts, passthrough=("ts",)).withWatermark(
        "ts", watermark
    )
    return triples.dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx", "subj", "pred", "obj"]
    )


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
