"""Reference baselines re-expressed Spark-first.

* :func:`spheroid_taxonomy` — the TIEmb/Ristoski baseline (reference
  libs/ristoski.py:25-122): per-class centroid + RMS radius, subclass test
  ``d(c_child, c_parent) < r_parent ∧ r_child < r_parent``, keep the
  nearest parent. Centroids via SQL roll-up (O27); the pairwise test is a
  T² cross join of class summaries (tiny) — all DataFrame ops.

* :func:`separability_probe` — reference libs/separability/evaluation.py:
  per class-pair linear separability. The container has no sklearn, so the
  LinearSVC is replaced by an L2-regularized logistic regression trained
  with plain numpy gradient descent inside one ``applyInPandas`` group per
  pair (same train/test protocol: seeded split, accuracy/P/R/F1 on the
  held-out fold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparktax.simsearch import centroid_per_label


def spheroid_taxonomy(
    labeled_embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (child, parent, distance) — one nearest enclosing spheroid per
    child class (reference keep-nearest-parent, ristoski.py:96-122)."""
    cent = centroid_per_label(labeled_embeddings, label_col, vec_col)
    a = cent.select(
        F.col(label_col).alias("child"),
        F.col("centroid").alias("_cc"),
        F.col("radius").alias("_cr"),
    )
    b = cent.select(
        F.col(label_col).alias("parent"),
        F.col("centroid").alias("_pc"),
        F.col("radius").alias("_pr"),
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("_cc"), F.col("_pc"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("child") != F.col("parent"))
        .withColumn("distance", dist)
        .filter((F.col("distance") < F.col("_pr")) & (F.col("_cr") < F.col("_pr")))
    )
    w = Window.partitionBy("child").orderBy(F.asc("distance"), F.asc("parent"))
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("child", "parent", F.round("distance", 6).alias("distance"))
    )


def _logreg_fit_predict(
    Xtr: np.ndarray, ytr: np.ndarray, Xte: np.ndarray, epochs: int = 200, lr: float = 0.5, l2: float = 1e-3
) -> np.ndarray:
    mu, sd = Xtr.mean(axis=0), Xtr.std(axis=0) + 1e-9
    Xtr = (Xtr - mu) / sd
    Xte = (Xte - mu) / sd
    n, d = Xtr.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(epochs):
        z = Xtr @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - ytr
        w -= lr * (Xtr.T @ g / n + l2 * w)
        b -= lr * g.mean()
    return (1.0 / (1.0 + np.exp(-(Xte @ w + b)))) >= 0.5


def separability_probe(
    dataset: DataFrame,
    embeddings: DataFrame,
    test_fraction: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """dataset(sample_id, entity_id, class_id) ⋈ embeddings(entity_id,
    vector) → per class-pair (class_a < class_b) held-out accuracy/P/R/F1.

    The pair grid is built by a self-join on class ids; each pair's rows
    flow into one Arrow group where the numpy classifier runs (pairs are
    sample-bounded by construction)."""
    rows = dataset.join(embeddings, "entity_id").select(
        "entity_id", "class_id", "vector"
    )
    classes = [r[0] for r in rows.select("class_id").distinct().collect()]
    pairs = [(a, b) for i, a in enumerate(sorted(classes)) for b in sorted(classes)[i + 1 :]]
    spark = dataset.sparkSession
    pair_df = spark.createDataFrame(pairs, "class_a int, class_b int")
    tagged = (
        rows.join(
            pair_df,
            (F.col("class_id") == F.col("class_a"))
            | (F.col("class_id") == F.col("class_b")),
        )
        .withColumn("pair_id", F.col("class_a") * 10000 + F.col("class_b"))
    )

    out_schema = (
        "class_a int, class_b int, n long, accuracy double, precision double, "
        "recall double, f1 double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        a, b = int(pdf["class_a"].iloc[0]), int(pdf["class_b"].iloc[0])
        X = np.stack(pdf["vector"].to_numpy()).astype(np.float64)
        y = (pdf["class_id"].to_numpy() == b).astype(np.float64)
        rng = np.random.RandomState(seed + a * 1000 + b)
        idx = rng.permutation(len(y))
        n_test = max(int(len(y) * test_fraction), 1)
        te, tr = idx[:n_test], idx[n_test:]
        if len(tr) == 0 or len(set(y[tr])) < 2:
            return pd.DataFrame(
                [[a, b, len(y), np.nan, np.nan, np.nan, np.nan]],
                columns=["class_a", "class_b", "n", "accuracy", "precision", "recall", "f1"],
            )
        pred = _logreg_fit_predict(X[tr], y[tr], X[te])
        yt = y[te].astype(bool)
        tp = int((pred & yt).sum())
        fp = int((pred & ~yt).sum())
        fn = int((~pred & yt).sum())
        acc = float((pred == yt).mean())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return pd.DataFrame(
            [[a, b, len(y), acc, p, r, f1]],
            columns=["class_a", "class_b", "n", "accuracy", "precision", "recall", "f1"],
        )

    return tagged.groupBy("pair_id").applyInPandas(kernel, schema=out_schema)
