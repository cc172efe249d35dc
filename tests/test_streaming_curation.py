"""Streaming corpus curation: per-micro-batch quality gates + incremental
dedup. Two-batch stream must equal one-batch stream — gates are per-doc
and the exact dedup lane is arrival-order-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparktax.streaming import curate_stream, read_document_stream


def _good(i: int) -> str:
    return (
        f"the quick brown fox number {i} jumps over the lazy dog and "
        f"then it runs far away into the quiet green forest tonight"
    )


@pytest.fixture()
def drops(spark, tmp_path):
    """Two file drops: drop 2 replays doc 0 verbatim, re-sends doc 1's
    text under a NEW id, and adds junk + fresh docs."""
    first = [(i, _good(i), "src0") for i in range(6)] + [
        (6, "!!! ??? !!!", "src0")  # junk: fails the quality gate
    ]
    second = [
        (0, _good(0), "src0"),      # exact replay (same id + text)
        (100, _good(1), "src0"),    # same text, new id → fingerprint dup
        (7, _good(7), "src0"),
        (8, "### $$$ %%%", "src0"),  # junk
        (9, _good(9), "src0"),
    ]
    path = str(tmp_path / "docs")
    schema = "doc_id long, text string, source string"
    spark.createDataFrame(first, schema).write.mode("overwrite").parquet(path)
    spark.createDataFrame(second, schema).write.mode("append").parquet(path)
    return path


def _run(spark, path, out, ckpt, files_per_trigger):
    q = curate_stream(
        read_document_stream(spark, path, max_files_per_trigger=files_per_trigger),
        out,
        checkpoint_dir=ckpt,
        min_quality=0.5,
        near=False,
    )
    q.awaitTermination(180)


def _kept(spark, out):
    return sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{out}/clean").collect()
    )


def test_two_batch_equals_one_batch(spark, tmp_path, drops):
    one, two = str(tmp_path / "one"), str(tmp_path / "two")
    _run(spark, drops, one, str(tmp_path / "c1"), files_per_trigger=10)
    _run(spark, drops, two, str(tmp_path / "c2"), files_per_trigger=1)
    k1, k2 = _kept(spark, one), _kept(spark, two)
    assert k1 == k2
    ids = [i for i, _ in k1]
    # replay + same-text-new-id suppressed; junk gated; fresh docs kept
    assert ids == [0, 1, 2, 3, 4, 5, 7, 9]


def test_classifier_gate(spark, tmp_path, drops):
    """A trained learned gate composes with dedup: train en-vs-junk on a
    tiny labeled set, stream with classifier only (no heuristic gate)."""
    from sparktax.textops import train_quality_classifier

    pos = spark.createDataFrame(
        [(i, _good(i)) for i in range(20)], "doc_id long, text string"
    )
    neg = spark.createDataFrame(
        [(i, "zz qq xx " * 3) for i in range(20, 40)],
        "doc_id long, text string",
    )
    wq, bq = train_quality_classifier(pos, neg, buckets=256, hasher="md5")
    out = str(tmp_path / "clf")
    q = curate_stream(
        read_document_stream(spark, drops, max_files_per_trigger=1),
        out,
        checkpoint_dir=str(tmp_path / "c3"),
        classifier=(wq, bq),
        classifier_hasher="md5",
        near=False,
    )
    q.awaitTermination(180)
    ids = [i for i, _ in _kept(spark, out)]
    # learned gate keeps the fox docs, drops the junk; dedup still fires
    assert ids == [0, 1, 2, 3, 4, 5, 7, 9]


def test_near_dedup_composes_with_classifier(spark, tmp_path):
    """near=True (MinHash lane) + learned gate together: a REWORDED
    replay of a kept doc is suppressed, distinct docs survive, junk is
    gated. Docs must be mutually DISSIMILAR (the two-batch fixture's
    near-identical template docs would all collapse into one)."""
    import random

    from sparktax.textops import train_quality_classifier

    rng = random.Random(3)
    vocab = [f"word{i}" for i in range(300)]

    def distinct(i):
        rng2 = random.Random(i)
        return " ".join(rng2.sample(vocab, 25))

    first = [(i, distinct(i), "s") for i in range(5)]
    reworded = distinct(2).replace("word", "term", 1)  # one token changed
    second = [
        (200, reworded, "s"),          # near-replay of doc 2
        (5, distinct(5), "s"),
        (6, "zz qq " * 4, "s"),        # junk for the classifier
    ]
    path = str(tmp_path / "neardocs")
    schema = "doc_id long, text string, source string"
    spark.createDataFrame(first, schema).write.mode("overwrite").parquet(path)
    spark.createDataFrame(second, schema).write.mode("append").parquet(path)

    pos = spark.createDataFrame(
        [(1000 + i, distinct(1000 + i)) for i in range(20)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, "zz qq xx " * 3) for i in range(2000, 2020)],
        "doc_id long, text string",
    )
    wq, bq = train_quality_classifier(pos, neg, buckets=256, hasher="md5")
    out = str(tmp_path / "near_clf")
    q = curate_stream(
        read_document_stream(spark, path, max_files_per_trigger=1),
        out,
        checkpoint_dir=str(tmp_path / "c4"),
        classifier=(wq, bq),
        classifier_hasher="md5",
        near=True,
        dedup_params={"threshold": 0.6, "n": 4, "k": 64, "bands": 16},
    )
    q.awaitTermination(180)
    ids = [i for i, _ in _kept(spark, out)]
    assert 200 not in ids          # reworded replay suppressed by near lane
    assert 2 in ids                # the original survived
    assert 6 not in ids            # junk still gated
    assert 5 in ids                # distinct late arrival survives
