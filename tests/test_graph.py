"""KnowledgeGraph layer: encoding, pattern lookup, aggregates, sampling."""

from __future__ import annotations

import pandas as pd
import pytest

from sparktax import synth
from sparktax.graph import KnowledgeGraph
from sparktax.graph.kg import encode_triples


@pytest.fixture(scope="module")
def kg(spark):
    triples, entities, relations = synth.gen_kg_pdf(n_entities=300, n_triples=1200)
    t = spark.createDataFrame(triples)
    e = spark.createDataFrame(entities)
    r = spark.createDataFrame(relations)
    return KnowledgeGraph(t, e, r).cache(), triples, entities, relations


def test_encode_roundtrip(spark):
    raw_pdf = pd.DataFrame(
        {
            "subj": ["dbr:A", "dbr:A", "dbr:B"],
            "pred": ["rdf:type", "dbo:knows", "rdf:type"],
            "obj": ["dbo:Person", "dbr:B", "dbo:Person"],
        }
    )
    raw = spark.createDataFrame(raw_pdf)
    triples, entities, relations = encode_triples(raw)
    kg = KnowledgeGraph(triples, entities, relations)
    decoded = kg.decode(triples).toPandas()
    got = set(map(tuple, decoded[["h_uri", "r_uri", "t_uri"]].itertuples(index=False)))
    want = set(map(tuple, raw_pdf.itertuples(index=False)))
    assert got == want
    # dense ids from 0
    ids = sorted(entities.toPandas()["id"])
    assert ids == list(range(len(ids)))


def test_find_triples_patterns(kg):
    g, triples, entities, relations = kg
    some = triples.iloc[0]
    h, r, t = int(some.h), int(some.r), int(some.t)
    assert g.contains(h, r, t)
    # (h,*,*)
    got = g.find_triples(h=h).toPandas()
    want = triples[triples.h == h]
    assert len(got) == len(want)
    # (*,r,t)
    got = g.find_triples(r=r, t=t).toPandas()
    want = triples[(triples.r == r) & (triples.t == t)]
    assert len(got) == len(want)
    # max_results
    assert g.find_triples(r=r, max_results=3).count() <= 3
    # name coercion
    assert g.find_triples(r="rdf:type").count() == len(triples[triples.r == 0])


def test_class_sizes_matches_pandas(kg):
    g, triples, entities, relations = kg
    got = g.class_sizes(valid_only=False).toPandas().set_index("t")["n_instances"]
    want = triples[triples.r == 0].groupby("t").size()
    assert got.sort_index().equals(want.sort_index().rename("n_instances"))


def test_valid_type_filter(kg):
    g, _, entities, _ = kg
    valid = set(g.valid_type_ids().toPandas()["id"])
    bad = entities[
        ~entities.uri.str.startswith("dbo:") | entities.uri.str.contains(":Wikidata")
    ]
    assert valid.isdisjoint(set(bad.id))


def test_existential_extension(kg):
    g, triples, entities, relations = kg
    rel = int(triples[triples.r >= 4].r.iloc[0])
    cls = int(triples[triples.r == 0].t.iloc[0])
    got = set(g.instances_of_existential(rel, cls).toPandas()["h"])
    typed = set(triples[(triples.r == 0) & (triples.t == cls)].h)
    want = set(triples[(triples.r == rel) & triples.t.isin(typed)].h)
    assert got == want


def test_sample_deterministic(kg):
    g, *_ = kg
    a = sorted(g.sample_instances(25, seed=123).toPandas()["h"])
    b = sorted(g.sample_instances(25, seed=123).toPandas()["h"])
    c = sorted(g.sample_instances(25, seed=124).toPandas()["h"])
    assert a == b
    assert len(a) == 25
    assert a != c


def test_lightweight_drops_excluded(kg):
    g, triples, entities, relations = kg
    lw = g.lightweight()
    bad_ids = set(
        relations[relations.uri.isin(["rdfs:label", "foaf:name", "dcterms:description"])].id
    )
    remaining = set(lw.triples.select("r").distinct().toPandas()["r"])
    assert remaining.isdisjoint(bad_ids)


def test_encode_hash_method(spark):
    raw_pdf = pd.DataFrame(
        {
            "subj": ["dbr:A", "dbr:A", "dbr:B"],
            "pred": ["rdf:type", "dbo:knows", "rdf:type"],
            "obj": ["dbo:Person", "dbr:B", "dbo:Person"],
        }
    )
    raw = spark.createDataFrame(raw_pdf)
    triples, entities, relations = encode_triples(raw, method="hash")
    kg = KnowledgeGraph(triples, entities, relations)
    decoded = kg.decode(triples).toPandas()
    got = set(map(tuple, decoded[["h_uri", "r_uri", "t_uri"]].itertuples(index=False)))
    want = set(map(tuple, raw_pdf.itertuples(index=False)))
    assert got == want
    # zero-shuffle encode: no Exchange in the triples plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        triples.explain("formatted")
    assert "Exchange" not in buf.getvalue()
