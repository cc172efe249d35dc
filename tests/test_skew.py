"""Skew utilities: heavy-hitter detection, salted two-phase aggregation,
salted broadcast join — results equal the unsalted plans."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparktax.skew import (
    replicate_broadcast_side,
    salted_agg,
    salted_count,
    salted_join,
    top_hot_keys,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 5000 + ["a"] * 50 + ["b"] * 30,
            "v": list(range(5000)) + list(range(50)) + list(range(30)),
        }
    )
    return spark.createDataFrame(pdf).repartition(8).cache()


def test_top_hot_keys(skewed):
    assert top_hot_keys(skewed, "k", min_count=1000) == ["hot"]
    assert set(top_hot_keys(skewed, "k", min_count=20)) == {"hot", "a", "b"}


def test_with_salt_spreads_hot_only(skewed):
    salted = with_salt(skewed, "k", ["hot"], buckets=8)
    dist = salted.groupBy("k").agg(F.countDistinct("_salt").alias("s")).toPandas()
    d = dict(zip(dist.k, dist.s))
    assert d["hot"] == 8
    assert d["a"] == 1 and d["b"] == 1


def test_salted_count_matches_plain(skewed):
    got = salted_count(skewed, "k", hot_min_count=1000, buckets=8).toPandas()
    want = skewed.groupBy("k").count().toPandas()
    assert dict(zip(got.k, got.n)) == dict(zip(want.k, want["count"]))


def test_salted_agg_sum_min_max(skewed):
    got = salted_agg(
        skewed,
        "k",
        {"s": F.sum("v"), "mn": F.min("v"), "mx": F.max("v")},
        {"s": F.sum("s"), "mn": F.min("mn"), "mx": F.max("mx")},
        hot_min_count=1000,
        buckets=8,
    ).toPandas()
    want = skewed.groupBy("k").agg(
        F.sum("v").alias("s"), F.min("v").alias("mn"), F.max("v").alias("mx")
    ).toPandas()
    assert got.sort_values("k").reset_index(drop=True).equals(
        want.sort_values("k").reset_index(drop=True)
    )


def test_salted_join_matches_plain(spark, skewed):
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["hot", "hot", "a", "c"], "label": ["H1", "H2", "A", "C"]}
        )
    )
    got = salted_join(skewed, right, "k", hot_min_count=1000, buckets=8)
    want = skewed.join(right, "k")
    # salt column is dropped from the output but must appear in the plan
    assert "_salt" in got._jdf.queryExecution().analyzed().toString()
    g = got.groupBy("k", "label").count().toPandas().sort_values(["k", "label"]).reset_index(drop=True)
    w = want.groupBy("k", "label").count().toPandas().sort_values(["k", "label"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)
    # left join parity (unmatched left rows survive exactly once)
    gl = salted_join(skewed, right, "k", how="left", hot_min_count=1000, buckets=8)
    assert gl.count() == skewed.join(right, "k", "left").count()


def test_salted_join_no_hot_keys_falls_through(spark, skewed):
    right = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "label": ["A", "B"]}))
    got = salted_join(skewed, right, "k", hot_min_count=10**9)
    assert "_salt" not in got.columns
    assert got.count() == skewed.join(right, "k").count()


def test_mine_atoms_salted_path_matches_unsalted(spark):
    """Hub-entity KG: the 2-hop existential join key concentrates on one
    target; the salted plan must be row-identical to the plain one and the
    salt must actually appear in the executed plan (north_rule evidence)."""
    import pandas as pd_

    from sparktax.graph import KnowledgeGraph
    from sparktax.induction import mine_atoms

    n = 200
    rows = []
    for i in range(n):
        rows.append((i, 5, 500))  # every entity links to the hub
        rows.append((i, 5, 600 + i % 5))  # plus a cold target
    for tgt in [500] + [600 + j for j in range(5)]:
        rows.append((tgt, 0, 100 if tgt == 500 else 101))  # targets typed
    triples = spark.createDataFrame(
        pd_.DataFrame(rows, columns=["h", "r", "t"]).astype("int64")
    )
    ents = spark.createDataFrame(
        pd_.DataFrame(
            {"id": [100, 101, 500] + [600 + j for j in range(5)],
             "uri": ["dbo:HubClass", "dbo:ColdClass", "dbr:hub"]
             + [f"dbr:cold{j}" for j in range(5)]}
        )
    )
    rels = spark.createDataFrame(
        pd_.DataFrame({"id": [0, 5], "uri": ["rdf:type", "links"]})
    )
    kg = KnowledgeGraph(triples, ents, rels)
    sample = spark.createDataFrame(
        pd_.DataFrame({"task_id": [0] * n, "h": list(range(n))}).astype("int64")
    )
    plain = mine_atoms(kg, sample)
    salted = mine_atoms(kg, sample, salt_hot_min=50, salt_buckets=4)
    p = set(map(tuple, plain.toPandas().itertuples(index=False)))
    s = set(map(tuple, salted.toPandas().itertuples(index=False)))
    assert p == s and p
    # hub atom really exists (the skewed key did flow through the join)
    assert any(a == "E:5.C:100" for _, _, a in p)
    # the salted path was actually taken
    assert "_salt" in salted._jdf.queryExecution().analyzed().toString()


def test_auto_hot_keys_threshold_tracks_shuffle_target(spark, skewed):
    from sparktax.skew import auto_hot_keys

    # 5080 rows / 32 partitions ≈ 159 per reducer; only "hot" (5000) exceeds
    # max(2×159, 1000)
    assert auto_hot_keys(skewed, "k") == ["hot"]
    # uniform data: nothing hot
    uni = spark.range(4000).select((F.col("id") % 100).alias("k"))
    assert auto_hot_keys(uni, "k") == []
    # floor wins on tiny inputs even when one key dominates
    tiny = spark.createDataFrame(
        pd.DataFrame({"k": ["x"] * 50 + ["y"] * 2})
    )
    assert auto_hot_keys(tiny, "k") == []


def test_mine_atoms_salts_by_default_on_hub_kg(spark):
    """north_rule posture: with no tuning, a hub-entity KG must take the
    salted 2-hop path (plan contains _salt) and match the unsalted rows."""
    import pandas as pd_

    from sparktax.graph import KnowledgeGraph
    from sparktax.induction import mine_atoms

    n = 1200  # hub key count must clear auto_hot_keys' floor of 1000
    rows = [(i, 5, 500) for i in range(n)]
    rows += [(i, 5, 600 + i % 5) for i in range(n)]
    for tgt in [500] + [600 + j for j in range(5)]:
        rows.append((tgt, 0, 100 if tgt == 500 else 101))
    triples = spark.createDataFrame(
        pd_.DataFrame(rows, columns=["h", "r", "t"]).astype("int64")
    )
    ents = spark.createDataFrame(
        pd_.DataFrame(
            {"id": [100, 101, 500] + [600 + j for j in range(5)],
             "uri": ["dbo:HubClass", "dbo:ColdClass", "dbr:hub"]
             + [f"dbr:cold{j}" for j in range(5)]}
        )
    )
    rels = spark.createDataFrame(
        pd_.DataFrame({"id": [0, 5], "uri": ["rdf:type", "links"]})
    )
    kg = KnowledgeGraph(triples, ents, rels)
    sample = spark.createDataFrame(
        pd_.DataFrame({"task_id": [0] * n, "h": list(range(n))}).astype("int64")
    )
    auto = mine_atoms(kg, sample)  # default: salt_hot_min="auto"
    assert "_salt" in auto._jdf.queryExecution().analyzed().toString()
    plain = mine_atoms(kg, sample, salt_hot_min=None)
    assert "_salt" not in plain._jdf.queryExecution().analyzed().toString()
    a = set(map(tuple, auto.toPandas().itertuples(index=False)))
    p = set(map(tuple, plain.toPandas().itertuples(index=False)))
    assert a == p and any(atom == "E:5.C:100" for _, _, atom in a)


def test_salted_broadcast_join(spark, skewed):
    dim = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "a", "b"], "label": ["H", "A", "B"]})
    )
    salted_fact = with_salt(skewed, "k", ["hot"], buckets=8)
    salted_dim = replicate_broadcast_side(dim, buckets=8)
    joined = salted_fact.join(
        F.broadcast(salted_dim), ["k", "_salt"]
    )
    assert joined.count() == skewed.count()
    plain = skewed.join(F.broadcast(dim), "k")
    assert joined.groupBy("label").count().toPandas().sort_values("label").equals(
        plain.groupBy("label").count().toPandas().sort_values("label")
    )
