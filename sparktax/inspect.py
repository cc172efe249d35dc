"""Per-cluster inspection panels (reference libs/axiom_induction/modules.py:
32-91: ``KnownTypeModule`` / ``TrueTypeModule`` / ``RankingModule``, plus
the ``join``/``create_section`` display helpers :13-29).

The reference modules are driver-side Counters over one cluster at a
time; here each module is ONE DataFrame over *all* (task, node) pairs —
window functions instead of per-cluster ``most_common`` — and only the
final drill-down report collects (bounded: a clustering task has ≤ 2n−1
nodes for an n-row sample, n ≤ a few hundred by construction, P10).
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparktax.display import to_html, to_text


def known_types(clu: DataFrame, k: int = 5) -> DataFrame:
    """(task_id, node, class_id, pct, pos) — the top-``k`` training-set
    classes per cluster node by share of its leaves (reference
    ``KnownTypeModule.to_table``: ``composition.most_common(k)`` scaled to
    percent, modules.py:44-48)."""
    from sparktax.cluster.spark import cluster_composition, cluster_sizes

    comp = cluster_composition(clu).join(
        cluster_sizes(clu), ["task_id", "node"]
    )
    w = Window.partitionBy("task_id", "node").orderBy(
        F.desc("n"), F.asc("class_id")
    )
    return (
        comp.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(
            "task_id",
            "node",
            "class_id",
            (100.0 * F.col("n") / F.col("size")).alias("pct"),
            "pos",
        )
    )


def true_types(clu: DataFrame, kg, k: int | None = None) -> DataFrame:
    """(task_id, node, t, pct, pos) — most frequent KG types among each
    cluster's member *entities*, with access to the full graph rather
    than only the training labels (reference ``TrueTypeModule`` →
    ``extract_types_from_cluster``, modules.py:50-59).

    One join pipeline for every node at once: closure → leaf entity ids →
    isa edges (the t-keyed co-located copy when attached) → count.
    """
    from sparktax.cluster.spark import cluster_sizes, leaf_assignments

    members = (
        clu.filter(F.col("kind") == "closure")
        .select("task_id", F.col("a").alias("node"), F.col("b").alias("leaf"))
        .join(
            leaf_assignments(clu).select("task_id", "leaf", "entity_id"),
            ["task_id", "leaf"],
        )
    )
    typed = kg.triples_keyed_on("h").filter(F.col("r") == kg.isa).select(
        F.col("h").alias("entity_id"), "t"
    )
    counts = (
        members.join(typed, "entity_id")
        .groupBy("task_id", "node", "t")
        .agg(F.count("*").alias("n"))
        .join(cluster_sizes(clu), ["task_id", "node"])
    )
    w = Window.partitionBy("task_id", "node").orderBy(F.desc("n"), F.asc("t"))
    out = counts.withColumn("pos", F.row_number().over(w)).select(
        "task_id",
        "node",
        "t",
        (100.0 * F.col("n") / F.col("size")).alias("pct"),
        "pos",
    )
    return out.filter(F.col("pos") <= k) if k is not None else out


def cluster_ranks(fdf: DataFrame) -> DataFrame:
    """(task_id, node, class_id, f1, rank) — for each class, the rank of
    every cluster by F-score (0 = this cluster is the class's best),
    reference ``RankingModule.F_ranked``:
    ``np.argsort(-F, axis=0).argsort(axis=0)`` (modules.py:63-77) as one
    window, never a dense driver matrix."""
    w = Window.partitionBy("task_id", "class_id").orderBy(
        F.desc("f1"), F.asc("node")
    )
    return fdf.select(
        "task_id",
        "node",
        "class_id",
        "f1",
        (F.row_number().over(w) - 1).alias("rank"),
    )


def ranking_table(fdf: DataFrame, n_best: int = 5, max_rank: int = 20) -> DataFrame:
    """(task_id, node, class_id, rank, f1, pos) — per cluster, the
    ``n_best`` classes for which it ranks highest, cut at ``max_rank``
    (reference ``RankingModule.to_table``, modules.py:79-91)."""
    ranked = cluster_ranks(fdf)
    w = Window.partitionBy("task_id", "node").orderBy(
        F.asc("rank"), F.desc("f1"), F.asc("class_id")
    )
    return (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter((F.col("pos") <= n_best) & (F.col("rank") <= max_rank))
        .select("task_id", "node", "class_id", "rank", "f1", "pos")
    )


def cluster_report(
    clu: DataFrame,
    fdf: DataFrame,
    kg=None,
    task_id: int = 0,
    nodes: list[int] | None = None,
    k: int = 5,
    class_names: dict | None = None,
    filename: str | None = None,
    fmt: str = "html",
) -> str:
    """Drill-down report: one panel per cluster node with its composition
    top-k, optional full-KG type frequencies, and best-ranked classes —
    the reference's ``create_section`` + ``display_table`` notebook flow
    (modules.py:13-29) as a self-contained HTML/text string.

    Driver-bounded by construction: panels only for ``nodes`` (default:
    every node of ``task_id``, ≤ 2n−1 for an n-row sample).
    """
    name_of = class_names or {}

    def cname(cid) -> str:
        return str(name_of.get(cid, cid))

    kt = known_types(clu, k=k).filter(F.col("task_id") == task_id)
    rk = ranking_table(fdf, n_best=k).filter(F.col("task_id") == task_id)
    if nodes is not None:
        kt = kt.filter(F.col("node").isin(list(nodes)))
        rk = rk.filter(F.col("node").isin(list(nodes)))
    kt_rows = kt.orderBy("node", "pos").collect()
    rk_rows = rk.orderBy("node", "pos").collect()
    tt_rows = []
    if kg is not None:
        tt = true_types(clu, kg, k=k).filter(F.col("task_id") == task_id)
        if nodes is not None:
            tt = tt.filter(F.col("node").isin(list(nodes)))
        tt_rows = tt.orderBy("node", "pos").collect()

    by_node: dict[int, dict[str, list]] = {}
    for r in kt_rows:
        by_node.setdefault(r.node, {}).setdefault("known", []).append(
            (cname(r.class_id), f"{r.pct:.1f}%")
        )
    for r in tt_rows:
        by_node.setdefault(r.node, {}).setdefault("true", []).append(
            (cname(r.t), f"{r.pct:.1f}%")
        )
    for r in rk_rows:
        by_node.setdefault(r.node, {}).setdefault("rank", []).append(
            (cname(r.class_id), r.rank, f"{r.f1:.3f}")
        )

    render = to_html if fmt == "html" else to_text
    parts: list[str] = []
    if fmt == "html":
        parts.append("<div class='sparktax-clusters'>")
    for node in sorted(by_node):
        secs = by_node[node]
        title = f"Cluster {node}"
        if fmt == "html":
            parts.append(f"<h3>{_html.escape(title)}</h3>")
        else:
            parts.append(f"== {title} ==")
        for label, cols, key in (
            ("Known types (training labels)", ["class", "share"], "known"),
            ("True types (full KG)", ["type", "share"], "true"),
            ("Best-ranked classes (F)", ["class", "rank", "f1"], "rank"),
        ):
            rows = secs.get(key)
            if not rows:
                continue
            if fmt == "html":
                parts.append(f"<b>{_html.escape(label)}</b>")
            else:
                parts.append(label)
            parts.append(render(rows, cols=cols))
    if fmt == "html":
        parts.append("</div>")
    out = "\n".join(parts)
    if filename is not None:
        with open(filename, "w", encoding="utf8") as f:
            f.write(out)
    return out
