"""Streaming incremental linking (round-4 verdict stretch): foreachBatch
ingest → incremental dedup → extraction → exact dictionary linking →
hash-encode append. Two-batch stream must equal one-batch stream on the
same transcripts — canonical ids are content-derived, so no cross-batch
coordination exists to get wrong."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparktax import synth
from sparktax.streaming import ingest_linked_graph, read_transcript_stream


@pytest.fixture()
def drops(spark, tmp_path):
    """Two file drops with a REPLAYED turn (same conv/turn/text in both
    files) and an aliased entity the dictionary canonicalizes."""
    pdf, gold = synth.gen_transcripts_pdf(n_convs=30, seed=5)
    half = len(pdf) // 2
    first, second = pdf.iloc[:half], pdf.iloc[half:]
    # replay the first turn of drop 1 inside drop 2 (at-least-once source)
    second = pd.concat([first.iloc[[0]], second], ignore_index=True)
    path = str(tmp_path / "drops")
    synth.transcripts_to_spark(spark, first).write.mode("overwrite").parquet(path)
    synth.transcripts_to_spark(spark, second).write.mode("append").parquet(path)
    return path, pdf, gold


@pytest.fixture()
def dictionary(spark, drops):
    """Canonicalize one real extracted surface to a canonical uri."""
    _, pdf, gold = drops
    surface = gold.iloc[0]["subj"]  # a subj surface that definitely occurs
    return spark.createDataFrame(
        [(surface, "canon:THE_ENTITY", 0.9), (surface.upper(), "canon:THE_ENTITY", 0.5)],
        "surface string, canonical string, prior double",
    )


def _run(spark, path, out, ckpt, dictionary, files_per_trigger):
    q = ingest_linked_graph(
        read_transcript_stream(spark, path, max_files_per_trigger=files_per_trigger),
        out,
        checkpoint_dir=ckpt,
        dictionary=dictionary,
    )
    q.awaitTermination(180)


def _tables(spark, out):
    edges = sorted(
        (r.h, r.r, r.t)
        for r in spark.read.parquet(f"{out}/edges").collect()
    )
    nodes = {(r.id, r.uri) for r in spark.read.parquet(f"{out}/nodes").collect()}
    rels = {(r.id, r.uri) for r in spark.read.parquet(f"{out}/relations").collect()}
    return edges, nodes, rels


def test_two_batch_equals_one_batch(spark, tmp_path, drops, dictionary):
    path, pdf, gold = drops
    one, two = str(tmp_path / "one"), str(tmp_path / "two")
    _run(spark, path, one, str(tmp_path / "c1"), dictionary, files_per_trigger=10)
    _run(spark, path, two, str(tmp_path / "c2"), dictionary, files_per_trigger=1)
    e1, n1, r1 = _tables(spark, one)
    e2, n2, r2 = _tables(spark, two)
    assert e1 == e2 and n1 == n2 and r1 == r2
    # the replayed turn was suppressed: edge bag matches the gold count
    # (each gold statement exactly once, no double extraction)
    assert len(e1) == len(gold)
    # linking fired: the canonical uri is a node, the raw surface is not
    uris = {u for _, u in n1}
    assert "canon:THE_ENTITY" in uris
    assert gold.iloc[0]["subj"] not in uris
    # ids are stable content hashes: id == xxhash64(uri) for every node
    df = spark.read.parquet(f"{one}/nodes")
    assert df.filter(F.col("id") != F.xxhash64("uri")).count() == 0


def test_dedup_index_suppresses_cross_batch(spark, tmp_path, drops, dictionary):
    """Restarting the stream over the same data with the same out_dir but
    a FRESH checkpoint re-reads the files; the persisted dedup index still
    suppresses every already-ingested turn → no new edges."""
    path, pdf, gold = drops
    out = str(tmp_path / "out")
    _run(spark, path, out, str(tmp_path / "c1"), dictionary, files_per_trigger=10)
    n_edges = spark.read.parquet(f"{out}/edges").count()
    _run(spark, path, out, str(tmp_path / "c_fresh"), dictionary, files_per_trigger=10)
    assert spark.read.parquet(f"{out}/edges").count() == n_edges
