"""Separability distance analysis (reference libs/separability): class
centroids over the KG, pairwise geometric distances, taxonomic path-cost
distance, and their correlation on planted blobs; plus the reference
text-format dataset IO round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparktax import synth
from sparktax.graph import KnowledgeGraph
from sparktax.separability import (
    centroid_distances,
    distance_report,
    kg_class_centroids,
    taxonomic_distance,
)
from sparktax.tree import Tree


def test_taxonomic_distance_formula():
    # A → B → D, A → C
    t = Tree.from_edges([("B", "A"), ("D", "B"), ("C", "A")])
    # D..A costs 1/1 + 1/2; C..A costs 1/1
    assert taxonomic_distance("D", "C", t) == pytest.approx(2.5)
    # siblings at depth 1: 1 + 1
    assert taxonomic_distance("B", "C", t) == pytest.approx(2.0)
    # node to its own ancestor: only the descending side pays
    assert taxonomic_distance("D", "A", t) == pytest.approx(1.5)
    assert taxonomic_distance("D", "D", t) == 0.0


@pytest.fixture(scope="module")
def blobs(spark):
    dataset, classes, emb, gold = synth.gen_blob_embeddings_pdf(per_class=30, seed=42)
    name2id = dict(zip(classes.class_name, classes.class_id))
    triples = spark.createDataFrame(
        [
            (int(e), 0, 1000 + int(c))
            for e, c in zip(dataset.entity_id, dataset.class_id)
        ],
        "h long, r long, t long",
    )
    kg = KnowledgeGraph(triples, None, None)
    kg._isa_id = 0
    emb_df = spark.createDataFrame(emb)
    tree = Tree.from_edges(
        [(1000 + name2id[c], 1000 + name2id[p]) for c, p in gold]
    )
    return kg, emb_df, tree, name2id


def test_kg_class_centroids_match_numpy(spark, blobs):
    kg, emb_df, tree, name2id = blobs
    cent = kg_class_centroids(kg, emb_df).toPandas().set_index("class_id")
    # recompute one class centroid in numpy
    emb = emb_df.toPandas().set_index("entity_id")
    typed = kg.triples.toPandas()
    some = 1000 + name2id["D"]
    members = typed[(typed.r == 0) & (typed.t == some)].h
    want = np.mean(np.stack(emb.loc[members, "vector"].to_numpy()), axis=0)
    got = np.array(cent.loc[some, "centroid"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert int(cent.loc[some, "n_instances"]) == len(members)


def test_distance_correlation_on_planted_blobs(spark, blobs):
    """Nested classes are geometrically closer by construction → taxonomic
    and geometric distances correlate positively."""
    kg, emb_df, tree, name2id = blobs
    cent = kg_class_centroids(kg, emb_df)
    records, corr = distance_report(cent, tree)
    assert records
    by_pair = {
        tuple(sorted((r["a"], r["b"]))): r for r in records
    }
    d, e, f = (1000 + name2id[x] for x in "DEF")
    sib = by_pair[tuple(sorted((d, e)))]  # D,E siblings under B
    far = by_pair[tuple(sorted((d, f)))]  # D,F in different subtrees
    assert sib["taxo"] < far["taxo"]
    assert sib["geom"] < far["geom"]
    assert sib["mixed"] == pytest.approx((sib["taxo"] + sib["geom"]) / 2)
    assert corr > 0.5


def test_centroid_distances_pairs(spark, blobs):
    kg, emb_df, tree, name2id = blobs
    cent = kg_class_centroids(kg, emb_df)
    n = cent.count()
    pairs = centroid_distances(cent).toPandas()
    assert len(pairs) == n * (n - 1) // 2
    assert (pairs.a < pairs.b).all()
    assert (pairs.geom >= 0).all()


# ------------------------------------------------------------------ dataset IO
def test_reference_dataset_io_roundtrip(spark, tmp_path):
    from sparktax import dataset_io

    d = str(tmp_path / "toy")
    # write a fixture in the reference's exact layout by hand
    import os

    os.makedirs(d)
    with open(f"{d}/cluster.indices", "w") as f:
        f.write("11\n22\n33\n44\n")
    with open(f"{d}/cluster.labels", "w") as f:
        f.write("0\n0\n1\n1\n")
    with open(f"{d}/name_to_index", "w") as f:
        f.write("dbo:Writer 0\ndbo:Place 1\n")
    with open(f"{d}/axioms", "w") as f:
        f.write("dbo:Writer dbo:Person\ndbo:Place owl:Thing\n")

    dataset, classes, axioms = dataset_io.load_dataset(spark, d)
    assert dataset.count() == 4
    got = dataset.orderBy("sample_id").toPandas()
    assert list(got.entity_id) == [11, 22, 33, 44]
    assert list(got.class_id) == [0, 0, 1, 1]
    assert dict(classes.toPandas().set_index("class_id").class_name) == {
        0: "dbo:Writer",
        1: "dbo:Place",
    }
    assert axioms == [("dbo:Writer", "dbo:Person"), ("dbo:Place", "owl:Thing")]

    # round-trip through save_dataset
    d2 = str(tmp_path / "copy")
    dataset_io.save_dataset(dataset, classes, axioms, d2)
    ds2, cls2, ax2 = dataset_io.load_dataset(spark, d2)
    assert ds2.orderBy("sample_id").toPandas().equals(got)
    assert ax2 == axioms
    with pytest.raises(FileExistsError):
        dataset_io.save_dataset(dataset, classes, axioms, d2)


def test_dataset_io_mismatched_lengths(spark, tmp_path):
    from sparktax import dataset_io

    d = str(tmp_path / "bad")
    import os

    os.makedirs(d)
    with open(f"{d}/cluster.indices", "w") as f:
        f.write("1\n2\n")
    with open(f"{d}/cluster.labels", "w") as f:
        f.write("0\n")
    with open(f"{d}/name_to_index", "w") as f:
        f.write("X 0\n")
    with open(f"{d}/axioms", "w") as f:
        f.write("X Y\n")
    with pytest.raises(ValueError):
        dataset_io.load_dataset(spark, d)
