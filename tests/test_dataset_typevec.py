"""Dataset creation (stratified seeded sampling, one-type labeling) and
type-co-occurrence vectors vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparktax import synth
from sparktax.dataset import class_counts, create_from_classes, create_from_instances
from sparktax.graph import KnowledgeGraph
from sparktax.typevec import type_vectors, type_vocabulary


@pytest.fixture(scope="module")
def kg(spark):
    triples, entities, relations = synth.gen_kg_pdf(n_entities=400, n_triples=1500)
    return (
        KnowledgeGraph(
            spark.createDataFrame(triples),
            spark.createDataFrame(entities),
            spark.createDataFrame(relations),
        ).cache(),
        triples,
        entities,
    )


def test_create_from_classes(kg):
    g, triples, entities = kg
    class_uris = ["dbo:Person", "dbo:City", "dbo:Company"]
    ds, cls = create_from_classes(g, class_uris, class_size=10, seed=1)
    dpdf = ds.toPandas()
    cpdf = cls.toPandas()
    assert list(cpdf.class_name) == class_uris
    # ≤10 per class, no duplicate entities, labels match actual types
    assert dpdf.groupby("class_id").size().le(10).all()
    assert dpdf.entity_id.is_unique
    assert sorted(dpdf.sample_id) == list(range(len(dpdf)))
    uri_by_id = dict(zip(entities.id, entities.uri))
    isa = triples[triples.r == 0]
    types_of = isa.groupby("h")["t"].apply(set)
    cls_ent_id = {u: i for i, u in uri_by_id.items()}
    for row in dpdf.itertuples(index=False):
        want_type = cls_ent_id[class_uris[row.class_id]]
        assert want_type in types_of[row.entity_id]
    # deterministic
    ds2, _ = create_from_classes(g, class_uris, class_size=10, seed=1)
    assert ds2.toPandas().equals(dpdf)


def test_create_from_instances(kg):
    g, triples, entities = kg
    inst = g.triples.select("h").distinct().limit(50)
    ds, cls = create_from_instances(g, inst, seed=3)
    dpdf, cpdf = ds.toPandas(), cls.toPandas()
    assert dpdf.entity_id.is_unique
    # every label is a valid type of the entity
    valid = set(
        entities[
            entities.uri.str.startswith("dbo:") & ~entities.uri.str.contains(":Wikidata")
        ].id
    )
    name_to_tid = {u: i for i, u in zip(entities.id, entities.uri)}
    types_of = triples[triples.r == 0].groupby("h")["t"].apply(set)
    cname = dict(zip(cpdf.class_id, cpdf.class_name))
    for row in dpdf.itertuples(index=False):
        tid = name_to_tid[cname[row.class_id]]
        assert tid in valid
        assert tid in types_of[row.entity_id]
    cc = class_counts(ds).toPandas()
    assert cc.n.sum() == len(dpdf)


def test_type_vectors_match_pandas(kg):
    g, triples, entities = kg
    k = 8
    vocab = type_vocabulary(g, k).toPandas()
    assert sorted(vocab.idx) == list(range(min(k, vocab.shape[0])))
    # oracle: own types + 1-hop object types
    isa = triples[triples.r == 0][["h", "t"]]
    non_isa = triples[triples.r != 0][["h", "t"]].rename(columns={"t": "x"})
    hop = non_isa.merge(isa.rename(columns={"h": "x"}), on="x")[["h", "t"]]
    occ = pd.concat([isa, hop]).merge(vocab, on="t")
    counts = occ.groupby(["h", "idx"]).size()

    got = type_vectors(g, k=k, normalize=False).toPandas()
    got_map = {r.entity_id: np.array(r.vector) for r in got.itertuples(index=False)}
    for (h, idx), n in counts.sample(min(len(counts), 80), random_state=0).items():
        assert got_map[h][idx] == pytest.approx(n)

    norm = type_vectors(g, k=k, normalize=True).toPandas()
    for r in norm.head(20).itertuples(index=False):
        v = np.array(r.vector)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
