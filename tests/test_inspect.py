"""Per-cluster inspection panels (reference libs/axiom_induction/modules.py
KnownTypeModule / TrueTypeModule / RankingModule / create_section)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparktax.cluster.spark import clusterize, f_matrix
from sparktax.inspect import (
    cluster_ranks,
    cluster_report,
    known_types,
    ranking_table,
    true_types,
)


@pytest.fixture()
def clustering(spark):
    """One task: two tight separated blobs, classes 0 and 1, 8 leaves."""
    rng = np.random.RandomState(3)
    rows = []
    for i in range(8):
        cls = 0 if i < 4 else 1
        vec = (rng.randn(3) * 0.01 + (0.0 if cls == 0 else 10.0)).tolist()
        rows.append((0, i, 100 + i, cls, [float(x) for x in vec]))
    tasks = spark.createDataFrame(
        rows,
        "task_id long, sample_id long, entity_id long, class_id long, "
        "vector array<float>",
    )
    clu = clusterize(tasks).cache()
    return clu


def test_known_types_shares(clustering):
    kt = {
        (r.node, r.class_id): (r.pct, r.pos)
        for r in known_types(clustering, k=5).collect()
    }
    n = 8
    root = 2 * n - 2
    # the root holds all leaves: both classes at 50%
    assert kt[(root, 0)][0] == pytest.approx(50.0)
    assert kt[(root, 1)][0] == pytest.approx(50.0)
    # a leaf node is 100% its own class, and pos starts at 1
    assert kt[(0, 0)] == (pytest.approx(100.0), 1)
    # top-k: never more than k rows per node
    counts = {}
    for node, _ in kt:
        counts[node] = counts.get(node, 0) + 1
    assert max(counts.values()) <= 5


def test_cluster_ranks_per_class(clustering):
    fdf = f_matrix(clustering)
    ranked = cluster_ranks(fdf).collect()
    # per class: ranks are 0..m-1 with exactly one best cluster
    for cls in (0, 1):
        ranks = sorted(r.rank for r in ranked if r.class_id == cls)
        assert ranks == list(range(len(ranks)))
        best = [r for r in ranked if r.class_id == cls and r.rank == 0]
        assert len(best) == 1 and best[0].f1 == pytest.approx(1.0)
        # the two blobs are perfectly separable: the rank-0 cluster for
        # class 0 is the pure 4-leaf blob {0..3} (node 0..3 or internal)
        assert best[0].f1 >= max(r.f1 for r in ranked if r.class_id == cls)


def test_ranking_table_cut(clustering):
    fdf = f_matrix(clustering)
    tab = ranking_table(fdf, n_best=1, max_rank=0).collect()
    # n_best=1, max_rank=0 → only (node, class) pairs where the node is
    # the class's single best cluster
    assert all(r.rank == 0 and r.pos == 1 for r in tab)
    assert len(tab) == 2  # one winner per class


def test_true_types_uses_full_kg(spark, clustering):
    """TrueTypeModule semantics: type shares come from the KG, not the
    training labels — entities can carry types outside the label set."""
    from sparktax.graph.kg import KnowledgeGraph

    # every sampled entity (100..107) has type 7000; the first blob also
    # has 7001 — neither is a training class id
    triples = [(100 + i, 5, 7000) for i in range(8)]
    triples += [(100 + i, 5, 7001) for i in range(4)]
    kg = KnowledgeGraph(
        spark.createDataFrame(triples, "h long, r long, t long"), None, None
    )
    kg._isa_id = 5
    tt = {
        (r.node, r.t): r.pct for r in true_types(clustering, kg).collect()
    }
    n = 8
    root = 2 * n - 2
    assert tt[(root, 7000)] == pytest.approx(100.0)
    assert tt[(root, 7001)] == pytest.approx(50.0)
    assert (0, 7001) in tt  # leaf 0 is in the first blob


def test_cluster_report_html_and_text(spark, clustering, tmp_path):
    from sparktax.graph.kg import KnowledgeGraph

    fdf = f_matrix(clustering)
    kg = KnowledgeGraph(
        spark.createDataFrame(
            [(100 + i, 5, 7000) for i in range(8)], "h long, r long, t long"
        ),
        None,
        None,
    )
    kg._isa_id = 5
    path = str(tmp_path / "report.html")
    html = cluster_report(
        clustering,
        fdf,
        kg=kg,
        nodes=[14],
        class_names={0: "dbo:Animal", 1: "dbo:Place", 7000: "dbo:Thing"},
        filename=path,
    )
    assert "Cluster 14" in html and "dbo:Animal" in html
    assert "dbo:Thing" in html  # the full-KG section rendered
    assert "<table" in html and open(path).read() == html
    txt = cluster_report(clustering, fdf, nodes=[14], fmt="text")
    assert "== Cluster 14 ==" in txt and "<table" not in txt
