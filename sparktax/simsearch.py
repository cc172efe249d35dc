"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k, pure Catalyst
  (``zip_with`` dot product + window rank). Baseline and oracle target.
* :func:`lsh_topk` — random-hyperplane (sign-LSH) bucketed ANN: linear
  signature pass, candidates from Hamming-band equi-join, exact rerank.
  The 100 TB path: no cross join ever materializes.

Scores are rounded to 6 decimals so results hash identically across
engines (float-sum order differences live below that).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity_expr(a, b):
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(0.0)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, score, rank) — exact top-k cosine neighbors
    for each query row (excluding self). ``queries`` has the same schema as
    ``embeddings`` and is small → broadcast against the corpus (a narrow
    scan, no shuffle of the corpus)."""
    q = broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    cand = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        cand.join(q, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity_expr(F.col("_qv"), F.col("_cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig) — sign pattern of ``n_planes`` seeded random projections,
    packed into a long. Computed as Catalyst expressions over a literal
    plane matrix (no Python in the path)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in planes[p]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return embeddings.select(F.col(id_col).alias("id"), sig.alias("sig"))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 signature
    band with the query (Hamming-style blocking), exact cosine rerank on
    candidates only."""
    bits = n_planes // n_bands
    mask = (1 << bits) - 1

    def banded(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.shiftrightunsigned("sig", bits * i)
                            .bitwiseAND(F.lit(mask))
                            .alias("key"),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("bk"),
        ).select("id", "bk.band", "bk.key")

    corpus_sig = banded(hyperplane_signatures(embeddings, dim, n_planes, seed, id_col, vec_col))
    query_sig = banded(hyperplane_signatures(queries, dim, n_planes, seed, id_col, vec_col))
    cand_ids = (
        corpus_sig.alias("c")
        .join(broadcast(query_sig.alias("q")), ["band", "key"])
        .select(F.col("q.id").alias("query_id"), F.col("c.id").alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    qv = broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    cv = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand_ids.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity_expr(F.col("_qv"), F.col("_cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means centroids for IVF, trained driver-side (numpy
    Lloyd iterations; the container has no MLlib-free alternative worth a
    shuffle) on a seeded ``xxhash64``-ordered sample. Returns a unit-norm
    (n_cells, dim) matrix — small by construction, shipped to executors as
    literal expressions."""
    pdf = (
        embeddings.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample)
        .select(vec_col)
        .toPandas()
    )
    X = np.stack(pdf[vec_col].to_numpy()).astype(float)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def _cell_scores(vec_col: str, centroids: np.ndarray):
    """Array of (dot(v, c_j), j) structs — dot with unit-norm centroids
    ranks cells by cosine."""
    return F.array(
        *[
            F.struct(
                _dot(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in centroids[j]]),
                ).alias("s"),
                F.lit(j).alias("j"),
            )
            for j in range(len(centroids))
        ]
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) — each vector's nearest-centroid cell, pure Catalyst
    (argmax = array_max over (score, j) structs)."""
    cell = F.array_max(_cell_scores(vec_col, centroids)).getField("j")
    return embeddings.select(F.col(id_col).alias("id"), cell.alias("cell"))


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors partition into ``n_cells``
    inverted lists (one narrow assignment pass); each query probes its
    ``n_probe`` closest cells and reranks exactly within them.

    The 100 TB shape: centroid training reads a bounded sample, assignment
    is a narrow map, candidate generation is an equi-join on ``cell``
    against a broadcast query-probe table — candidate volume is
    ~n_probe/n_cells of the corpus per query instead of all of it, and no
    cross join ever materializes. Recall is tunable via ``n_probe``
    (recall→1 as n_probe→n_cells)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_cells, sample, seed=seed, id_col=id_col, vec_col=vec_col
        )
    corpus_cells = ivf_assign(embeddings, centroids, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id"
    )
    probes = F.transform(
        F.slice(F.reverse(F.array_sort(_cell_scores(vec_col, centroids))), 1, n_probe),
        lambda s: s.getField("j"),
    )
    query_cells = queries.select(
        F.col(id_col).alias("query_id"), F.explode(probes).alias("cell")
    )
    cand_ids = (
        corpus_cells.join(broadcast(query_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    cv = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand_ids.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity_expr(F.col("_qv"), F.col("_cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    method: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold, a < b.

    ``method='lsh'`` (the scale path): sign-LSH banded blocking generates
    candidates, exact cosine verifies — no cross join ever materializes.
    ``method='exact'``: full pairwise (only for small/blocked subsets;
    the oracle-checkable mode)."""
    e = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if method == "exact":
        pairs = (
            e.alias("x")
            .join(e.alias("y"), F.col("x._id") < F.col("y._id"))
            .select(
                F.col("x._id").alias("a"),
                F.col("y._id").alias("b"),
                F.round(
                    cosine_similarity_expr(F.col("x._v"), F.col("y._v")), 6
                ).alias("cosine"),
            )
        )
        return pairs.filter(F.col("cosine") >= threshold)
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    bits = n_planes // n_bands
    mask = (1 << bits) - 1
    sigs = hyperplane_signatures(e, dim, n_planes, seed, "_id", "_v")
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("sig", bits * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    va = e.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
    vb = e.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            F.round(cosine_similarity_expr(F.col("_va"), F.col("_vb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def centroid_per_label(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, centroid, radius) — mean vector per label + RMS distance
    (reference spheroid centroids, libs/separability/data.py:31-57 and
    libs/ristoski.py:68-81) via posexplode + groupBy, no UDF."""
    exploded = embeddings.select(
        label_col, F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    means = (
        exploded.groupBy(label_col, "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy(label_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm")
        )
        .select(
            label_col,
            F.transform(F.col("_pm"), lambda s: s.getField("m")).alias("centroid"),
        )
    )
    with_c = embeddings.join(means, label_col)
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        with_c.groupBy(label_col, "centroid")
        .agg(F.sqrt(F.avg(d2)).alias("radius"))
        .select(label_col, "centroid", "radius")
    )
