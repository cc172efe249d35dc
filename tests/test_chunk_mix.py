"""Document chunking (textops.chunk_documents) and deterministic corpus
mixing (textops.mix_corpora), each checked against an independent DuckDB
replay of the same semantics (the gate device: integer/string arithmetic
only, so both engines must agree bit-for-bit)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from sparktax.textops import chunk_documents, mix_corpora, mix_weight_params

# ---------------------------------------------------------------------------
# chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunk_gold(pdf: pd.DataFrame, size: int, stride: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", pdf)
    return con.execute(
        """
        WITH t AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(coalesce(text, ''),
                       '\\s+'), x -> x <> '') AS toks
            FROM docs
        ), s AS (
            SELECT doc_id, toks, unnest(range(0, len(toks), $stride)) AS cs
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               cs // $stride AS chunk_idx,
               cs AS chunk_start,
               len(toks[cs + 1 : cs + $size]) AS n_chunk_tokens,
               array_to_string(toks[cs + 1 : cs + $size], ' ') AS chunk_text
        FROM s ORDER BY doc_id, chunk_idx
        """,
        {"size": size, "stride": stride},
    ).df()


def _check_chunks(spark, rows, size, stride=None):
    df = _docs(spark, rows)
    got = (
        chunk_documents(df, size, stride)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    want = _chunk_gold(df.toPandas(), size, stride or size)
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
    for c in ("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens"):
        assert got[c].astype("int64").tolist() == want[c].astype(
            "int64"
        ).tolist(), (c, got, want)
    return got


def test_chunks_match_duckdb_with_overlap(spark):
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "one"),
        (2, ""),  # no chunks
        (3, None),  # no chunks
        (4, "  padded   whitespace  tokens  here  "),
    ]
    got = _check_chunks(spark, rows, size=4, stride=3)
    assert 2 not in set(got.doc_id) and 3 not in set(got.doc_id)
    # doc 0: starts 0,3,6,9 → last chunk is the single token "j"
    d0 = got[got.doc_id == 0]
    assert d0.chunk_start.tolist() == [0, 3, 6, 9]
    assert d0.n_chunk_tokens.tolist() == [4, 4, 4, 1]
    assert d0.chunk_text.tolist()[-1] == "j"


def test_chunks_nonoverlapping_default_reassembles(spark):
    text = " ".join(f"t{i}" for i in range(23))
    got = _check_chunks(spark, [(7, text)], size=5)  # stride defaults to 5
    assert " ".join(got.chunk_text) == text  # exact partition of the stream


def test_chunk_rejects_bad_params(spark):
    import pytest

    df = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, stride=-1)


def test_chunk_plan_has_no_exchange(spark):
    plan = (
        chunk_documents(_docs(spark, [(0, "a b c")]), 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # narrow map + generator only


# ---------------------------------------------------------------------------
# mix_corpora


def _mix_gold(pdf: pd.DataFrame, weights, seed) -> pd.DataFrame:
    """Independent DuckDB replay: same md5-uniform 60-bit device."""
    con = duckdb.connect()
    con.register("docs", pdf)
    vals = ", ".join(
        f"('{d}', {b}, {t})"
        for d, (b, t) in ((d, mix_weight_params(w)) for d, w in weights.items())
    )
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(doc_id::VARCHAR || ':{seed}'),"
        f"{j + 1},1))::BIGINT * {16 ** (14 - j)}"
        for j in range(15)
    )
    return con.execute(
        f"""
        WITH w(dom, base, thresh) AS (VALUES {vals}),
        u AS (SELECT doc_id, source, ({u60}) AS u60 FROM docs),
        j AS (
            SELECT u.doc_id, u.source,
                   w.base + CASE WHEN u.u60 < w.thresh THEN 1 ELSE 0 END
                       AS n_copies
            FROM u JOIN w ON u.source = w.dom
        )
        SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy_idx
        FROM j WHERE n_copies > 0
        ORDER BY doc_id, copy_idx
        """
    ).df()


def _mix_docs(spark, n=200):
    return spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 4}") for i in range(n)],
        "doc_id long, text string, source string",
    )


def test_mix_matches_duckdb_replay(spark):
    weights = {"src0": 2.5, "src1": 0.25, "src2": 1.0, "src3": 0.0}
    df = _mix_docs(spark)
    got = (
        mix_corpora(df, weights, seed=11)
        .select("doc_id", "source", "copy_idx")
        .orderBy("doc_id", "copy_idx")
        .toPandas()
    )
    want = _mix_gold(df.toPandas(), weights, seed=11)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), (c, got, want)
    # semantics spot checks
    assert set(got[got.source == "src0"].copy_idx) >= {1, 2}  # floor(2.5)=2
    assert "src3" not in set(got.source)  # weight 0 drops
    kept1 = got[got.source == "src1"].doc_id.nunique()
    assert 0 < kept1 < 50  # 0.25 of 50 docs, not all, not none


def test_mix_weight_one_is_identity_and_seed_changes_draws(spark):
    df = _mix_docs(spark, 80)
    w = {f"src{i}": 1.0 for i in range(4)}
    out = mix_corpora(df, w, seed=3).select("doc_id", "copy_idx").toPandas()
    assert sorted(out.doc_id) == list(range(80))
    assert set(out.copy_idx) == {1}
    # fractional weight: different seeds select different subsets
    w = {f"src{i}": 0.5 for i in range(4)}
    a = set(mix_corpora(df, w, seed=1).toPandas().doc_id)
    b = set(mix_corpora(df, w, seed=2).toPandas().doc_id)
    assert a != b


def test_mix_default_weight_covers_unlisted_domains(spark):
    df = _mix_docs(spark, 40)
    out = mix_corpora(
        df, {"src0": 1.0}, seed=5, default_weight=2.0
    ).toPandas()
    assert set(out[out.source == "src1"].copy_idx) == {1, 2}
    assert set(out[out.source == "src0"].copy_idx) == {1}


def test_mix_plan_broadcasts_weights_no_corpus_shuffle(spark):
    df = _mix_docs(spark)
    plan = (
        mix_corpora(df, {"src0": 1.5}, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # corpus never shuffled


# ---------------------------------------------------------------------------
# training_order


def _order_gold(pdf, n_shards, seed, keys=("doc_id",)):
    con = duckdb.connect()
    con.register("docs", pdf)
    expr = " || ':' || ".join(f"{k}::VARCHAR" for k in keys)
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5({expr} || ':{seed}'),"
        f"{j + 1},1))::BIGINT * {16 ** (14 - j)}"
        for j in range(15)
    )
    key_list = ", ".join(keys)
    return con.execute(
        f"""
        WITH u AS (SELECT *, ({u60}) AS u60 FROM docs)
        SELECT {key_list}, (u60 % {n_shards}) AS shard_id,
               row_number() OVER (PARTITION BY u60 % {n_shards}
                   ORDER BY u60, {key_list}) - 1 AS pos
        FROM u ORDER BY {key_list}
        """
    ).df()


def test_training_order_matches_duckdb_and_is_a_permutation(spark):
    from sparktax.textops import training_order

    df = _mix_docs(spark, 150)
    got = (
        training_order(df, n_shards=8, seed=7)
        .select("doc_id", "shard_id", "pos")
        .orderBy("doc_id")
        .toPandas()
    )
    want = _order_gold(df.toPandas(), 8, 7)
    for c in ("doc_id", "shard_id", "pos"):
        assert got[c].astype("int64").tolist() == want[c].astype(
            "int64"
        ).tolist(), c
    # permutation: every doc exactly once; per-shard positions contiguous
    assert sorted(got.doc_id) == list(range(150))
    for _, g in got.groupby("shard_id"):
        assert sorted(g.pos) == list(range(len(g)))


def test_training_order_composes_with_mix(spark):
    """The full prep chain: mix (copies) -> shuffle; copies of the same
    doc get independent positions via extra_key_cols."""
    from sparktax.textops import training_order

    df = _mix_docs(spark, 100)
    mixed = mix_corpora(df, {f"src{i}": 2.0 for i in range(4)}, seed=1)
    out = (
        training_order(
            mixed, n_shards=4, seed=7, extra_key_cols=["copy_idx"]
        )
        .select("doc_id", "copy_idx", "shard_id", "pos")
        .toPandas()
    )
    assert len(out) == 200  # weight 2.0 → exactly two copies each
    want = _order_gold(
        out[["doc_id", "copy_idx"]], 4, 7, keys=("doc_id", "copy_idx")
    )
    got = out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    for c in ("shard_id", "pos"):
        assert got[c].astype("int64").tolist() == want[c].astype(
            "int64"
        ).tolist(), c
    # the two copies of a doc are (almost surely) in different slots
    by_doc = got.groupby("doc_id")[["shard_id", "pos"]].nunique()
    assert (by_doc.max(axis=1) > 1).mean() > 0.9


def test_training_order_plan_single_shard_shuffle(spark):
    from sparktax.textops import training_order

    plan = (
        training_order(_mix_docs(spark, 10), n_shards=4, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the shard shuffle


def test_training_order_rejects_bad_shards(spark):
    import pytest

    from sparktax.textops import training_order

    with pytest.raises(ValueError):
        training_order(_mix_docs(spark, 5), n_shards=0)


# ---------------------------------------------------------------------------
# prepare_training_corpus (the one-call chain) + pack carry_cols


def test_prepare_training_corpus_end_to_end(spark):
    from sparktax.textops import (
        mix_corpora,
        pack_sequences,
        prepare_training_corpus,
        training_order,
    )

    df = _mix_docs(spark, 120)
    weights = {f"src{i}": 1.0 + (i % 2) * 0.5 for i in range(4)}
    out = prepare_training_corpus(
        df, weights, n_shards=4, budget=64, seed=5
    ).toPandas()
    # equals the hand-wired chain (carry_cols path vs explicit recompute)
    mixed = mix_corpora(df, weights, seed=5)
    ordered = training_order(
        mixed, n_shards=4, seed=6, extra_key_cols=["copy_idx"]
    ).toPandas()
    assert len(out) == len(ordered)
    # stream contiguity within the gid order (shard-major read order)
    out = out.sort_values(["shard_id", "pos"]).reset_index(drop=True)
    pos = 0
    for r in out.itertuples():
        assert r.seq_id * 64 + r.seq_offset == pos
        pos += r.n_tokens
    # passthrough identity: (doc_id, copy_idx, shard_id, pos) match the
    # ordered stage exactly
    a = out[["doc_id", "copy_idx", "shard_id", "pos"]].sort_values(
        ["doc_id", "copy_idx"]
    )
    b = ordered[["doc_id", "copy_idx", "shard_id", "pos"]].sort_values(
        ["doc_id", "copy_idx"]
    )
    assert a.values.tolist() == b.values.tolist()
    # carry_cols on its own: extra column rides through unchanged
    p = pack_sequences(
        _docs(spark, [(0, "a b"), (1, "c")]).withColumn(
            "tag", F.col("doc_id") * 10
        ),
        budget=2,
        carry_cols=["tag"],
    ).toPandas()
    assert p.tag.tolist() == [0, 10]


# ---------------------------------------------------------------------------
# split_corpus


def test_split_matches_duckdb_and_partitions(spark):
    from sparktax.textops import split_corpus, split_thresholds

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = _mix_docs(spark, 400)
    got = (
        split_corpus(df, fr, seed=13)
        .select("doc_id", "split")
        .orderBy("doc_id")
        .toPandas()
    )
    # exhaustive + disjoint by construction; fractions approximately hold
    assert len(got) == 400 and set(got.split) == set(fr)
    counts = got.split.value_counts()
    assert counts["train"] > 250 and counts["val"] < 80
    # DuckDB replay with the identical integer thresholds
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(doc_id::VARCHAR || ':13'),"
        f"{j + 1},1))::BIGINT * {16 ** (14 - j)}"
        for j in range(15)
    )
    ths = split_thresholds(fr)
    case = (
        "CASE "
        + " ".join(f"WHEN u60 < {t} THEN '{n}'" for n, t in ths[:-1])
        + f" ELSE '{ths[-1][0]}' END"
    )
    want = con.execute(
        f"""
        WITH u AS (SELECT doc_id, ({u60}) AS u60 FROM docs)
        SELECT doc_id, {case} AS split FROM u ORDER BY doc_id
        """
    ).df()
    assert got.split.tolist() == want.split.tolist()


def test_split_assignment_stable_under_growth(spark):
    """New rows never reshuffle old assignments — the property that
    keeps a held-out set uncontaminated as the corpus grows."""
    from sparktax.textops import split_corpus

    fr = {"train": 0.9, "heldout": 0.1}
    small = split_corpus(_mix_docs(spark, 100), fr, seed=5).toPandas()
    big = split_corpus(_mix_docs(spark, 300), fr, seed=5).toPandas()
    merged = small.merge(big, on="doc_id", suffixes=("_s", "_b"))
    assert (merged.split_s == merged.split_b).all()


def test_split_validation_and_plan(spark):
    import pytest

    from sparktax.textops import split_corpus

    df = _mix_docs(spark, 5)
    with pytest.raises(ValueError):
        split_corpus(df, {})
    with pytest.raises(ValueError):
        split_corpus(df, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_corpus(df, {"a": 1.5, "b": -0.5})
    plan = (
        split_corpus(df, {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure narrow map


def test_mix_weight_params_exact():
    assert mix_weight_params(0.0) == (0, 0)
    assert mix_weight_params(3.0) == (3, 0)
    base, thresh = mix_weight_params(2.5)
    assert base == 2 and thresh == (16**15) // 2
    import pytest

    with pytest.raises(ValueError):
        mix_weight_params(-0.1)
