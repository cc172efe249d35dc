"""Sequence packing (textops.pack_sequences): pack-then-chunk positions
via a distributed two-level prefix sum. The two-level decomposition is
integer-exact, so every value must equal the global cumulative sum an
engine with a single-threaded window computes directly — DuckDB is that
engine here."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from sparktax.textops import pack_sequences


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


def _gold(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", pdf)
    return con.execute(
        """
        WITH n AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(coalesce(text, ''),
                       '\\s+'), x -> x <> '')) AS n_tokens
            FROM docs
        ), c AS (
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS start
            FROM n
        )
        SELECT doc_id, n_tokens,
               start // $b AS seq_id,
               start % $b AS seq_offset,
               CASE WHEN n_tokens > 0
                    THEN (start + n_tokens - 1) // $b
                    ELSE start // $b END AS end_seq_id
        FROM c ORDER BY doc_id
        """,
        {"b": budget},
    ).df()


def _check(spark, texts, budget, ids=None, n_ranges=None):
    df = _docs(spark, texts, ids)
    got = (
        pack_sequences(df, budget, n_ranges=n_ranges)
        .orderBy("doc_id")
        .toPandas()
    )
    want = _gold(df.toPandas(), budget)
    for c in ("n_tokens", "seq_id", "seq_offset", "end_seq_id"):
        assert got[c].astype("int64").tolist() == want[c].astype(
            "int64"
        ).tolist(), (c, got, want)
    return got


def test_matches_global_cumsum_with_straddles(spark):
    texts = ["a b c", "d e", "f g h i j", "", "k", "l m n o p q r s"]
    got = _check(spark, texts, budget=4)
    # doc 2 (5 tokens starting at offset 5 → seq 1..2) straddles
    row = got.set_index("doc_id").loc[2]
    assert row.seq_id == 1 and row.end_seq_id == 2


def test_sparse_nonzero_ids_and_many_ranges(spark):
    texts = [f"tok {'x ' * (i % 7)}" for i in range(60)]
    ids = [1000 + 17 * i for i in range(60)]  # sparse, offset domain
    _check(spark, texts, budget=5, ids=ids, n_ranges=8)
    _check(spark, texts, budget=5, ids=ids, n_ranges=3)


def test_n_ranges_invariance(spark):
    """The decomposition is exact: any range count gives the same
    packing (ranges are a parallelism choice, not a semantic one)."""
    texts = [f"{'w ' * (i % 11)}end" for i in range(100)]
    a = _check(spark, texts, budget=16, n_ranges=1)
    b = _check(spark, texts, budget=16, n_ranges=13)
    assert a.equals(b)


def test_empty_input(spark):
    df = _docs(spark, [])
    out = pack_sequences(df, 8)
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "n_tokens", "seq_id", "seq_offset", "end_seq_id"
    ]


def test_no_single_partition_window(spark):
    """The scale property: no global-order window (Exchange
    SinglePartition) anywhere in the plan — the cumsum runs per range."""
    df = _docs(spark, ["a b", "c", "d e f"] * 10, ids=list(range(30)))
    plan = (
        pack_sequences(df, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_prepare_with_bpe_budget(spark):
    """bpe_merges switches the pack budget to real BPE token counts:
    per-doc n_tokens equals encode_bpe's count (copies inherit it), and
    the packed stream is the exact cumulative layout of those counts."""
    from pyspark.sql import functions as F

    from sparktax.bpe import encode_bpe, train_bpe
    from sparktax.textops import prepare_training_corpus

    rows = [
        (i, "the cat sat on the mat rat bat " * (1 + i % 3), f"src{i % 2}")
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    merges = train_bpe(docs, n_merges=10)
    want = {
        r.doc_id: r.n_bpe_tokens
        for r in encode_bpe(docs, merges).collect()
    }
    packed = prepare_training_corpus(
        docs,
        weights={"src0": 1.0, "src1": 2.0},
        n_shards=4,
        budget=64,
        seed=5,
        bpe_merges=merges,
    ).toPandas()
    assert (packed.n_tokens == packed.doc_id.map(want)).all()
    # exact cumulative layout: walking (shard, pos) order reproduces
    # every seq_id/seq_offset from the counts alone
    packed = packed.sort_values(["shard_id", "pos"]).reset_index(drop=True)
    cum = 0
    for r in packed.itertuples():
        assert r.seq_id == cum // 64 and r.seq_offset == cum % 64
        cum += r.n_tokens
        assert r.end_seq_id == (cum - 1) // 64 if r.n_tokens else True
