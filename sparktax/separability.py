"""Separability analysis: taxonomic vs geometric class distances
(reference libs/separability/data.py:22-57 + evaluation.py:20-48; the
classifier half — the numpy logistic probe — lives in sparktax.baselines).

Distributed lane (Spark SQL, oracle-checkable):

* :func:`kg_class_centroids` — per-class embedding centroid over isa
  triples: one join + posexplode/groupBy, no UDF.
* :func:`centroid_distances` — pairwise euclidean distances between class
  centroids. Classes number in the hundreds, so the pair join is tiny —
  the heavy part (the centroid aggregation over all instances) stays
  distributed.

Driver lane (plain Python over a collected gold tree):

* :func:`taxonomic_distance` — path-cost distance in the gold taxonomy
  (reference evaluation.py:20-35): cost = Σ 1/(k+1) climbing each class
  to the deepest common ancestor.
* :func:`distance_report` — per-pair (taxo, geom, mixed) records + the
  Pearson correlation between taxonomic and geometric distance: nested
  classes should be geometrically closer if embeddings respect the
  taxonomy.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sparktax.graph.kg import KnowledgeGraph
from sparktax.simsearch import centroid_per_label
from sparktax.tree import Tree


def kg_class_centroids(
    kg: KnowledgeGraph,
    embeddings: DataFrame,
    valid_types: DataFrame | None = None,
) -> DataFrame:
    """(class_id, centroid, radius, n_instances) — mean embedding per class
    (reference get_centroids, libs/separability/data.py:31-57).

    ``embeddings``: (entity_id, vector). The isa join is the wide part;
    the per-dimension average runs as posexplode + groupBy with map-side
    partial aggregation (no UDF, no driver collect).
    """
    typed = kg.triples.filter(F.col("r") == kg.isa).select("h", "t")
    if valid_types is not None:
        typed = typed.join(
            broadcast(valid_types.withColumnRenamed("id", "t")), "t", "left_semi"
        )
    inst = typed.join(
        embeddings.withColumnRenamed("entity_id", "h"), "h"
    ).select(F.col("t").alias("label"), F.col("vector").alias("embedding"))
    sizes = inst.groupBy("label").agg(F.count("*").alias("n_instances"))
    cent = centroid_per_label(inst)
    return (
        cent.join(sizes, "label")
        .select(
            F.col("label").alias("class_id"), "centroid", "radius", "n_instances"
        )
    )


def centroid_distances(centroids: DataFrame, id_col: str = "class_id") -> DataFrame:
    """(a, b, geom) — pairwise euclidean centroid distance for a < b
    (reference geometric_distance, evaluation.py:37-38)."""
    lhs = centroids.select(
        F.col(id_col).alias("a"), F.col("centroid").alias("_ca")
    )
    rhs = centroids.select(
        F.col(id_col).alias("b"), F.col("centroid").alias("_cb")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_ca"), F.col("_cb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        lhs.join(rhs, F.col("a") < F.col("b"))
        .select("a", "b", F.sqrt(d2).alias("geom"))
    )


def taxonomic_distance(a, b, tree: Tree) -> float:
    """Path-cost distance in a gold tree (reference taxonomic_distance,
    evaluation.py:20-35): climb each class to the *deepest* common
    ancestor, paying 1/(k+1) per level k."""
    ba, bb = tree.branch(a), tree.branch(b)
    common = set(ba) & set(bb)
    if not common:
        raise ValueError(f"{a!r} and {b!r} share no ancestor")
    min_depth = max(tree.depth(x) for x in common)
    da, db = tree.depth(a), tree.depth(b)
    return sum(1.0 / (k + 1) for k in range(min_depth, da)) + sum(
        1.0 / (k + 1) for k in range(min_depth, db)
    )


def distance_report(
    centroids: DataFrame, tree: Tree, id_col: str = "class_id"
) -> tuple[list[dict], float]:
    """Per-pair distance records + Pearson correlation(taxo, geom)
    (reference class_distance, evaluation.py:40-48).

    Only the per-class centroids (hundreds of rows) reach the driver; the
    instance-level aggregation stayed distributed upstream.
    """
    geo = {
        (r.a, r.b): r.geom
        for r in centroid_distances(centroids, id_col).collect()
    }
    records = []
    for (a, b), geom in sorted(geo.items(), key=lambda kv: (str(kv[0][0]), str(kv[0][1]))):
        if a not in tree.parent or b not in tree.parent:
            continue
        taxo = taxonomic_distance(a, b, tree)
        records.append(
            {"a": a, "b": b, "taxo": taxo, "geom": geom, "mixed": (taxo + geom) / 2}
        )
    corr = _pearson([r["taxo"] for r in records], [r["geom"] for r in records])
    return records, corr


def _pearson(xs: list[float], ys: list[float]) -> float:
    n = len(xs)
    if n < 2:
        return float("nan")
    mx = sum(xs) / n
    my = sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    if sxx == 0 or syy == 0:
        return float("nan")
    return sxy / math.sqrt(sxx * syy)
