"""OpenKE directory scan: h-t-r column order + scan-time row filters
(exclude lists, invalid-type removal, lightweight) — reference
KnowledgeGraph.from_dir semantics (knowledge_graph.py:152-190)."""

from __future__ import annotations

import pytest

from sparktax.graph.io import read_openke_dir


@pytest.fixture(scope="module")
def openke_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("openke")
    ents = [
        ("owl:Thing", 0),
        ("dbo:Writer", 1),
        ("dbo:Bad:Wikidata", 2),
        ("dbr:alice", 10),
        ("dbr:bob", 11),
        ("dbr:carol", 12),
        ("dbr:spam", 13),
    ]
    rels = [("rdf:type", 0), ("rdfs:label", 1), ("knows", 2), ("foaf:name", 3)]
    # (h, t, r) — OpenKE order
    triples = [
        (10, 1, 0),   # alice rdf:type Writer        (valid class)
        (10, 0, 0),   # alice rdf:type owl:Thing     (valid class)
        (11, 2, 0),   # bob rdf:type Bad:Wikidata    (invalid class)
        (11, 10, 0),  # bob rdf:type alice           (not a class at all)
        (10, 11, 2),  # alice knows bob
        (11, 12, 2),  # bob knows carol
        (13, 10, 2),  # spam knows alice             (dropped by exclude_entities)
        (10, 13, 2),  # alice knows spam             (dropped by exclude_entities)
        (10, 10, 1),  # alice rdfs:label alice       (lightweight-excluded rel)
        (11, 11, 3),  # bob foaf:name bob            (lightweight-excluded rel)
    ]
    with open(d / "entity2id.txt", "w") as f:
        print(len(ents), file=f)
        for uri, i in ents:
            print(f"{uri}\t{i}", file=f)
    with open(d / "relation2id.txt", "w") as f:
        print(len(rels), file=f)
        for uri, i in rels:
            print(f"{uri}\t{i}", file=f)
    with open(d / "train2id.txt", "w") as f:
        print(len(triples), file=f)
        for h, t, r in triples:
            print(h, t, r, file=f)
    return str(d)


def _rows(df):
    return set(map(tuple, df.select("h", "r", "t").toPandas().itertuples(index=False)))


def test_plain_scan_reads_all(spark, openke_dir):
    t, e, r = read_openke_dir(spark, openke_dir)
    assert len(_rows(t)) == 10
    assert e.count() == 7 and r.count() == 4
    # h t r order honored: alice knows bob = (10, 2, 11)
    assert (10, 2, 11) in _rows(t)


def test_exclude_relations(spark, openke_dir):
    t, _, _ = read_openke_dir(spark, openke_dir, exclude_relations={"knows"})
    got = _rows(t)
    assert all(r != 2 for _, r, _ in got)
    assert len(got) == 6


def test_exclude_entities_head_and_tail(spark, openke_dir):
    t, _, _ = read_openke_dir(spark, openke_dir, exclude_entities={"dbr:spam"})
    got = _rows(t)
    assert (13, 2, 10) not in got and (10, 2, 13) not in got
    assert len(got) == 8


def test_remove_invalid_types(spark, openke_dir):
    t, _, _ = read_openke_dir(spark, openke_dir, remove_invalid_types=True)
    got = _rows(t)
    # invalid-class isa rows dropped; owl:Thing + dbo:Writer kept
    assert (11, 0, 2) not in got and (11, 0, 10) not in got
    assert (10, 0, 1) in got and (10, 0, 0) in got
    # non-isa rows untouched
    assert (10, 2, 11) in got and (10, 1, 10) in got
    assert len(got) == 8


def test_lightweight_combines_filters(spark, openke_dir):
    t, _, _ = read_openke_dir(spark, openke_dir, lightweight=True)
    got = _rows(t)
    assert got == {
        (10, 0, 1),
        (10, 0, 0),
        (10, 2, 11),
        (11, 2, 12),
        (13, 2, 10),
        (10, 2, 13),
    }


def test_max_triples_applies_after_filters(spark, openke_dir):
    t, _, _ = read_openke_dir(spark, openke_dir, lightweight=True, max_triples=3)
    assert t.count() == 3
    # every surviving row is from the filtered set
    full, _, _ = read_openke_dir(spark, openke_dir, lightweight=True)
    assert _rows(t) <= _rows(full)


def test_text_writer_roundtrip(spark, openke_dir, tmp_path):
    """write_openke_text_dir emits the reference layout that
    read_openke_dir (and the reference from_dir) consume: full roundtrip
    preserves the triple multiset, dims, and split sizes."""
    from sparktax.graph.io import write_openke_text_dir

    t, e, r = read_openke_dir(spark, openke_dir)
    out = str(tmp_path / "export")
    write_openke_text_dir(t, e, r, out, test_split=0.2, val_split=0.2, seed=7)
    t2, e2, r2 = read_openke_dir(spark, out)
    assert _rows(t2) == _rows(t)
    assert e2.count() == e.count() and r2.count() == r.count()
    # header counts match body lengths, and the split is seeded-deterministic
    for fname in ("train2id.txt", "valid2id.txt", "test2id.txt"):
        lines = open(f"{out}/{fname}").read().splitlines()
        assert int(lines[0]) == len(lines) - 1
    first = open(f"{out}/train2id.txt").read()
    out2 = str(tmp_path / "export2")
    write_openke_text_dir(t, e, r, out2, test_split=0.2, val_split=0.2, seed=7)
    assert open(f"{out2}/train2id.txt").read() == first

    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_openke_text_dir(t, e, r, str(tmp_path / "cap"), max_rows=2)


def test_unknown_names_ignored(spark, openke_dir):
    t, _, _ = read_openke_dir(
        spark, openke_dir,
        exclude_entities={"dbr:ghost"}, exclude_relations={"nope"},
    )
    assert len(_rows(t)) == 10


def test_text_writer_guards_dims(spark, tmp_path):
    """The driver-collect guard covers the entity/relation dims too — a
    multi-million-row dim must raise, not silently collect (round-3
    verdict: the 3.55M-entity graph case)."""
    import pytest
    from pyspark.sql import functions as F

    from sparktax.graph.io import write_openke_text_dir

    t = spark.createDataFrame([(0, 0, 1)], "h long, r long, t long")
    big_e = spark.range(10).select(
        F.concat(F.lit("e"), "id").alias("uri"), F.col("id").alias("id")
    )
    r = spark.createDataFrame([("rel", 0)], "uri string, id long")
    with pytest.raises(ValueError, match="entity"):
        write_openke_text_dir(t, big_e, r, str(tmp_path / "g"), max_rows=5)
