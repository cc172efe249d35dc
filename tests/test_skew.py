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
