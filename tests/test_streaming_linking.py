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


def test_near_mode_suppresses_reworded_replay(spark, tmp_path, dictionary):
    """near=True: a REWORDED replay of an already-ingested turn (same
    content + one extra statement, char-4-gram Jaccard ≈ 0.8) is
    suppressed by the LSH lane — its marker triple never reaches the
    graph. With near=False (exact lane) the reworded copy is a new
    fingerprint and the marker IS extracted — the control proving the
    near lane, not something else, did the suppressing."""
    pdf, gold = synth.gen_transcripts_pdf(n_convs=20, seed=5)
    base = pdf.loc[pdf["text"].str.len().idxmax()]
    replay = base.copy()
    replay["turn_idx"] = 999  # distinct doc identity, near-identical text
    replay["text"] = base["text"] + " Marker_Entity works_at Marker_Corp."
    second = pd.DataFrame([replay])
    params = dict(threshold=0.6, n=4, k=64, bands=16)
    for near, marker_expected in ((True, False), (False, True)):
        path = str(tmp_path / f"drops_{near}")
        synth.transcripts_to_spark(spark, pdf).write.parquet(path)
        synth.transcripts_to_spark(spark, second).write.mode("append").parquet(path)
        out = str(tmp_path / f"out_{near}")
        q = ingest_linked_graph(
            read_transcript_stream(spark, path, max_files_per_trigger=1),
            out,
            checkpoint_dir=str(tmp_path / f"c_{near}"),
            dictionary=dictionary,
            near=near,
            dedup_params=params,
        )
        q.awaitTermination(180)
        uris = {r.uri for r in spark.read.parquet(f"{out}/nodes").collect()}
        assert ("Marker_Entity" in uris) == marker_expected, near


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


def test_compact_every_self_maintains_index(spark, tmp_path, drops, dictionary):
    """compact_every=1: a per-file-trigger stream folds the dedup index
    as it goes — the final graph is identical to the unmaintained run,
    and the index directory holds ONLY the compacted chain (every folded
    increment vacuumed), so a long stream's per-batch scan does not
    accumulate one parquet dir per batch."""
    import os

    from sparktax.catalog import snapshot_history

    path, pdf, gold = drops
    plain, kept = str(tmp_path / "plain"), str(tmp_path / "kept")
    _run(spark, path, plain, str(tmp_path / "cp"), dictionary, files_per_trigger=1)
    q = ingest_linked_graph(
        read_transcript_stream(spark, path, max_files_per_trigger=1),
        kept,
        checkpoint_dir=str(tmp_path / "ck"),
        dictionary=dictionary,
        compact_every=1,
    )
    q.awaitTermination(180)
    assert _tables(spark, plain) == _tables(spark, kept)
    idx = f"{kept}/_dedup_index"
    hist = snapshot_history(idx)
    assert any(
        e.get("params", {}).get("compact") for e in hist if e.get("op") is None
    )
    assert any(e.get("op") == "vacuum" for e in hist)
    vdirs = [d for d in os.listdir(idx) if d.startswith("v")]
    # 2 batches → ≤ (1 live compacted base + 1 fresh increment)
    assert len(vdirs) <= 2, vdirs
