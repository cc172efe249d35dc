"""Tree utilities (O55-O57, O63), edge-list IO (O7), resource registry (O8)."""

from __future__ import annotations

import pytest

from sparktax.resources import Resources
from sparktax.tree import Tree, read_edge_list, write_edge_list


EDGES = [("B", "A"), ("C", "A"), ("D", "B"), ("E", "B"), ("F", "C")]


def test_from_edges_and_navigation():
    t = Tree.from_edges(EDGES)
    assert t.root == "A"
    assert t.depth("D") == 2
    assert t.branch("D") == ["D", "B", "A"]
    assert set(t.leaves()) == {"D", "E", "F"}
    assert list(t.bfs())[0] == "A"
    assert set(t.bfs(max_depth=1)) == {"A", "B", "C"}
    assert list(t.dfs())[0] == "A"
    assert sorted(t.to_edges()) == sorted(EDGES)
    assert t.is_ancestor("A", "D") and not t.is_ancestor("D", "A")


def test_multi_root_and_cycles():
    with pytest.raises(ValueError):
        Tree.from_edges([("A", "B"), ("B", "A")])
    with pytest.raises(ValueError):
        Tree.from_edges([("B", "A"), ("D", "C")])  # two roots, no add_root
    t = Tree.from_edges([("B", "A"), ("D", "C")], add_root="ROOT")
    assert t.root == "ROOT"
    assert t.depth("B") == 2


def test_surgery_and_clip():
    t = Tree.from_edges(EDGES)
    t.move("F", "B")
    assert t.parent["F"] == "B"
    with pytest.raises(ValueError):
        t.move("B", "D")  # under own subtree
    clip = Tree.from_edges(EDGES).clip_at(1)
    assert clip["D"] == "B" and clip["F"] == "C" and clip["A"] == "A"


def test_edge_list_io(tmp_path):
    p = str(tmp_path / "tax.txt")
    write_edge_list(EDGES, p)
    assert read_edge_list(p) == EDGES
    assert read_edge_list(p, preprocess=str.lower)[0] == ("b", "a")


def test_resources_registry(spark, tmp_path):
    reg = Resources(str(tmp_path / "resources.json"))
    spark.range(5).write.parquet(str(tmp_path / "tbl"))
    reg.register("five", str(tmp_path / "tbl"))
    assert reg.names() == ["five"]
    assert reg.load(spark, "five").count() == 5
    with pytest.raises(KeyError):
        reg.register("five", "elsewhere")
    reg.register("five", str(tmp_path / "tbl"), overwrite=True)
    # persisted: a fresh instance sees it
    reg2 = Resources(str(tmp_path / "resources.json"))
    assert reg2.path_of("five").endswith("tbl")
    reg2.register_as_views(spark)
    assert spark.sql("select count(*) n from five").first()["n"] == 5
    with pytest.raises(KeyError):
        reg2.path_of("nope")


def test_catalog_shim_parquet_fallback(spark, tmp_path):
    from sparktax.catalog import iceberg_available, read_table, write_table

    assert not iceberg_available(spark)  # sandbox has no iceberg jar
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        (F.col("id") % 4).alias("h"), F.col("id").alias("t")
    )
    target = str(tmp_path / "edges")
    write_table(df, target, partition_by=("h",))
    got = read_table(spark, target)
    assert got.count() == 20
    # append mode (same partitioning — mixed layouts are invalid)
    write_table(df, target, partition_by=("h",), mode="append")
    assert read_table(spark, target).count() == 40


def test_snapshot_table_commits_history_timetravel(spark, tmp_path):
    """Parquet-fallback snapshot layer: atomic pointer commits, time
    travel, history, rollback — and old versions stay immutable."""
    from sparktax.catalog import (
        current_version,
        read_snapshot,
        rollback_snapshot,
        snapshot_history,
        write_snapshot,
    )

    d = str(tmp_path / "tbl")
    v1 = write_snapshot(spark.range(10).withColumnRenamed("id", "h"), d)
    v2 = write_snapshot(spark.range(25).withColumnRenamed("id", "h"), d, params={"run": 2})
    assert (v1, v2) == (1, 2)
    assert current_version(d) == 2
    assert read_snapshot(spark, d).count() == 25
    assert read_snapshot(spark, d, version=1).count() == 10  # time travel
    hist = snapshot_history(d)
    assert [e["version"] for e in hist] == [1, 2]
    assert hist[1]["parent"] == 1 and hist[1]["rows"] == 25
    assert hist[1]["params"] == {"run": 2}
    rollback_snapshot(d, 1)
    assert current_version(d) == 1
    assert read_snapshot(spark, d).count() == 10
    assert snapshot_history(d)[-1]["op"] == "rollback"
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        read_snapshot(spark, d, version=9)
    with _pt.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "missing"))


def test_materialize_graph_snapshots(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from sparktax.catalog import read_snapshot, snapshot_history
    from sparktax.link.canonicalize import materialize_graph

    triples = spark.createDataFrame(
        pd.DataFrame({"h": [1, 1, 2], "r": [0, 1, 0], "t": [2, 3, 3]})
    )
    ents = spark.createDataFrame(pd.DataFrame({"id": [1, 2, 3], "uri": ["a", "b", "c"]}))
    out = str(tmp_path / "g")
    materialize_graph(triples, ents, out, partitions=2, snapshots=True)
    materialize_graph(triples.filter(F.col("h") == 1), ents, out, snapshots=True)
    assert read_snapshot(spark, f"{out}/edges").count() == 2  # current = v2
    assert read_snapshot(spark, f"{out}/edges", version=1).count() == 3
    assert len(snapshot_history(f"{out}/edges")) == 2


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located bucketed tables: the 2-hop KG join shape (edges.t ==
    tail-typed.h) plans with ZERO shuffle exchanges when both sides are
    bucketed on the join key; the unbucketed plan shuffles both sides."""
    import re

    from pyspark.sql import functions as F

    from sparktax.catalog import read_bucketed, write_bucketed

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.range(20000).select(
            (F.col("id") % 500).alias("h"), F.lit(5).alias("r"), (F.col("id") % 300).alias("t")
        )
        tails = spark.range(300).select(
            F.col("id").alias("x"), (F.col("id") % 9).alias("cls")
        )
        write_bucketed(
            edges.withColumnRenamed("t", "x"), "edges_by_t",
            str(tmp_path / "et"), "x", n_buckets=8, sort_by="x",
        )
        write_bucketed(tails, "tails_by_x", str(tmp_path / "tx"), "x", n_buckets=8, sort_by="x")
        j = read_bucketed(spark, "edges_by_t").join(read_bucketed(spark, "tails_by_x"), "x")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0
        # same result as the plain join
        want = edges.withColumnRenamed("t", "x").join(tails, "x").count()
        assert j.count() == want
        # the unbucketed twin shuffles
        edges.write.mode("overwrite").parquet(str(tmp_path / "pe"))
        tails.write.mode("overwrite").parquet(str(tmp_path / "pt"))
        j2 = (
            spark.read.parquet(str(tmp_path / "pe")).withColumnRenamed("t", "x")
            .join(spark.read.parquet(str(tmp_path / "pt")), "x")
        )
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan2)) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS edges_by_t")
        spark.sql("DROP TABLE IF EXISTS tails_by_x")


def test_millify_matches_reference_formula(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from sparktax.fmt import millify, reference_millify, shorten_path

    vals = [
        0, 1, 9, 10, 999, 1000, 1049, 1051, 9999, 10_400, 999_999,
        1_000_000, 1_250_000, 12_500_000, 999_950_000, 1_000_000_000,
        2_500_000_000_000, 9_999_999_999_999_999,
        -5, -12_500, -3_200_000,
    ]
    df = spark.createDataFrame(pd.DataFrame({"n": vals}))
    got = dict(
        zip(vals, df.select(millify(F.col("n")).alias("m")).toPandas()["m"])
    )
    for v in vals:
        assert got[v] == reference_millify(v), (v, got[v], reference_millify(v))
    assert shorten_path("a/b") == "a/b"
    assert shorten_path("root/" + "x/" * 30 + "leaf", max_len=10) == "root/…/leaf"


def test_default_local_dir_and_driver_mem(monkeypatch, tmp_path):
    """Session scratch + heap defaults: env overrides win; the tmpfs
    fallback only engages with ≥32 GiB headroom; heap is clamped 8-64g."""
    import sparktax.session as S

    monkeypatch.setenv("SPARKTAX_LOCAL_DIR", str(tmp_path))
    assert S._default_local_dir() == str(tmp_path)
    monkeypatch.delenv("SPARKTAX_LOCAL_DIR")
    d = S._default_local_dir()
    assert d is None or d.startswith("/dev/shm")

    monkeypatch.setenv("SPARKTAX_DRIVER_MEM", "3g")
    assert S._default_driver_mem() == "3g"
    monkeypatch.delenv("SPARKTAX_DRIVER_MEM")
    got = S._default_driver_mem()
    assert got.endswith("g") and 8 <= int(got[:-1]) <= 64
