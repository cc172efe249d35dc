"""Dual bucketed edge copies wired into the hot 2-hop join (round-2
verdict item #5): mine_atoms over KnowledgeGraph.with_colocated must plan
the existential self-join with ZERO shuffle Exchanges, and the pipeline
flag must materialize + reuse the copies."""

import os
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparktax.catalog import materialize_edge_buckets
from sparktax.graph import KnowledgeGraph
from sparktax.induction import mine_atoms


def _uniform_kg(spark, n=2000, targets=50):
    """No hub keys: every 2-hop target gets n/targets rows, far below the
    auto-salting floor, so the salted path stays out of the plan."""
    rows = [(i, 5, 600 + i % targets) for i in range(n)]
    rows += [(600 + j, 0, 100 + j % 2) for j in range(targets)]
    triples = spark.createDataFrame(
        pd.DataFrame(rows, columns=["h", "r", "t"]).astype("int64")
    )
    ents = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [100, 101] + [600 + j for j in range(targets)],
                "uri": ["dbo:A", "dbo:B"] + [f"dbr:t{j}" for j in range(targets)],
            }
        )
    )
    rels = spark.createDataFrame(
        pd.DataFrame({"id": [0, 5], "uri": ["rdf:type", "links"]})
    )
    sample = spark.createDataFrame(
        pd.DataFrame({"task_id": [0] * n, "h": list(range(n))}).astype("int64")
    )
    return KnowledgeGraph(triples, ents, rels), triples, sample


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _join_key_exchanges(plan: str) -> int:
    """Shuffles whose partitioning key is the 2-hop join key ``x`` — the
    exchanges the co-located layout exists to remove. (Auxiliary subtrees —
    the sample's distinct, the valid-types dim — shuffle on other keys and
    appear identically in both plans.)"""
    return len(re.findall(r"Exchange hashpartitioning\(x#", plan))


def test_mine_atoms_colocated_zero_exchange_join(spark, tmp_path):
    kg, triples, sample = _uniform_kg(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        by_h, by_t = materialize_edge_buckets(
            spark, triples, str(tmp_path / "buckets"), n_buckets=8
        )
        co_kg, _, _ = _uniform_kg(spark)
        co_kg = co_kg.with_colocated(by_h=by_h, by_t=by_t)

        plain = mine_atoms(kg, sample)
        co = mine_atoms(co_kg, sample)

        # same rows either way
        p = set(map(tuple, plain.toPandas().itertuples(index=False)))
        c = set(map(tuple, co.toPandas().itertuples(index=False)))
        assert p == c and any(a.startswith("E:5.C:") for _, _, a in p)

        # neither plan salts (uniform data), so the join-key exchanges
        # isolate the 2-hop join: co-located = zero, plain shuffles both
        # join sides on x.
        assert "_salt" not in co._jdf.queryExecution().analyzed().toString()
        co_plan, plain_plan = _plan(co), _plan(plain)
        assert _join_key_exchanges(co_plan) == 0, co_plan
        assert _join_key_exchanges(plain_plan) >= 2
        # and the join really reads the bucketed copies
        assert co_plan.count("Bucketed: true") >= 2
        assert "SortMergeJoin" in co_plan

        # the type-vector 2-hop join (typevec.cooccurrence_counts) takes
        # the same co-located path
        from sparktax.typevec import cooccurrence_counts, type_vocabulary

        co_kg._isa_id = 0
        kg._isa_id = 0

        # class_sizes groups on t → zero-exchange aggregate over the
        # t-bucketed copy
        cs_co, cs_plain = co_kg.class_sizes(False), kg.class_sizes(False)
        assert not re.findall(r"Exchange hashpartitioning\(t#", _plan(cs_co))
        assert re.findall(r"Exchange hashpartitioning\(t#", _plan(cs_plain))
        a = sorted(map(tuple, cs_co.toPandas().itertuples(index=False)))
        b = sorted(map(tuple, cs_plain.toPandas().itertuples(index=False)))
        assert a == b and a

        vocab = type_vocabulary(kg, k=8)
        tv_co = cooccurrence_counts(co_kg, vocab)
        tv_plain = cooccurrence_counts(kg, vocab)
        assert _join_key_exchanges(_plan(tv_co)) == 0
        assert _join_key_exchanges(_plan(tv_plain)) >= 2
        a = sorted(map(tuple, tv_co.toPandas().itertuples(index=False)))
        b = sorted(map(tuple, tv_plain.toPandas().itertuples(index=False)))
        assert a == b and a
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        for key in ("h", "t"):
            for t in spark.catalog.listTables():
                if t.name.startswith(f"sparktax_edges_by_{key}_"):
                    spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_materialize_edge_buckets_idempotent(spark, tmp_path):
    """A resumed run must reuse the written copies, not rewrite them."""
    df = spark.range(100).select(
        F.col("id").alias("h"), F.lit(1).alias("r"), (F.col("id") % 7).alias("t")
    )
    d = str(tmp_path / "eb")
    by_h, by_t = materialize_edge_buckets(spark, df, d, n_buckets=4)
    assert by_h.count() == 100 and by_t.count() == 100
    marker = os.path.join(d, "by_h", "_SUCCESS")
    stamp = os.path.getmtime(marker)
    by_h2, _ = materialize_edge_buckets(spark, df, d, n_buckets=4)
    assert os.path.getmtime(marker) == stamp  # no rewrite
    assert by_h2.count() == 100
    for t in spark.catalog.listTables():
        if t.name.startswith("sparktax_edges_by_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_pipeline_bucket_edges_flag(spark, tmp_path):
    """End-to-end: bucket_edges=N writes 45_edge_buckets/{by_h,by_t} and
    the run still completes with the same stage outputs."""
    from sparktax import synth
    from sparktax.pipeline import run_pipeline

    pdf, _gold = synth.gen_transcripts_pdf(n_convs=40, seed=7)
    transcripts = synth.transcripts_to_spark(spark, pdf)
    wd = str(tmp_path / "run")
    summary = run_pipeline(spark, transcripts, wd, bucket_edges=4)
    assert "60_taxonomy" in summary
    for key in ("h", "t"):
        assert os.path.exists(
            os.path.join(wd, "45_edge_buckets", f"by_{key}", "_SUCCESS")
        )
    for t in spark.catalog.listTables():
        if t.name.startswith("sparktax_edges_by_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_materialize_edge_buckets_fingerprint_invalidation(spark, tmp_path):
    """Changed upstream lineage must rewrite the bucket copies — reuse is
    tied to the edges stage fingerprint, not just _SUCCESS existence."""
    d = str(tmp_path / "ebfp")
    df1 = spark.range(50).select(
        F.col("id").alias("h"), F.lit(1).alias("r"), (F.col("id") % 5).alias("t")
    )
    by_h, _ = materialize_edge_buckets(spark, df1, d, n_buckets=4, fingerprint="fp1")
    assert by_h.count() == 50
    marker = os.path.join(d, "by_h", "_SUCCESS")
    stamp = os.path.getmtime(marker)
    # same fingerprint → reuse
    by_h2, _ = materialize_edge_buckets(spark, df1, d, n_buckets=4, fingerprint="fp1")
    assert os.path.getmtime(marker) == stamp and by_h2.count() == 50
    # new fingerprint (upstream changed) → rewrite with the new data
    df2 = spark.range(80).select(
        F.col("id").alias("h"), F.lit(1).alias("r"), (F.col("id") % 5).alias("t")
    )
    by_h3, _ = materialize_edge_buckets(spark, df2, d, n_buckets=4, fingerprint="fp2")
    assert by_h3.count() == 80
    for t in spark.catalog.listTables():
        if t.name.startswith("sparktax_edges_by_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
