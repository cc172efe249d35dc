"""Product-quantization ANN (sparktax/pq.py): codebook determinism, the
integer encoder vs an independent numpy recompute, ADC recall sanity,
and the exactness anchor (full probe + full rerank ≡ exact top-k)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparktax.pq import (
    _lloyd_l2,
    ivfpq_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from sparktax.simsearch import cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.orderBy("vec_id").limit(5)


@pytest.fixture(scope="module")
def emb_pdf(emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    return pdf.sort_values("vec_id").reset_index(drop=True)


def _md5_sample(pdf, sample, seed):
    """Row-ordered sample matrix by the engine-portable md5 rank — the
    independent (hashlib) twin of md5_rank_expr."""
    keyed = sorted(
        (
            (
                int(hashlib.md5(f"{r.vec_id}:{seed}".encode()).hexdigest()[:15], 16),
                r.vec_id,
                np.asarray(r.embedding, dtype=float),
            )
            for r in pdf.itertuples()
        ),
    )
    return np.stack([v for _, _, v in keyed[:sample]])


def test_codebooks_shape_and_md5_determinism(emb, emb_pdf):
    cb = train_pq_codebooks(emb, m_sub=8, n_codes=16, seed=7, rank_on="md5")
    assert cb.shape == (8, 16, 8)
    # independent recompute: hashlib-ranked sample + the same _lloyd_l2
    X = _md5_sample(emb_pdf, 4096, 7)
    expect = np.stack(
        [_lloyd_l2(X[:, m * 8 : (m + 1) * 8], 16, 10, 7 + m) for m in range(8)]
    )
    assert np.array_equal(cb, expect)


def test_encode_int_matches_numpy(emb, emb_pdf):
    """The engine's all-integer encoder vs a naive per-row numpy loop
    sharing NO Spark code: quantize both sides to round(x·2²⁰) and take
    argmin of integer squared L2 per subspace."""
    cb = train_pq_codebooks(emb, m_sub=8, n_codes=16, seed=42, rank_on="md5")
    got = {
        r["id"]: list(r["codes"])
        for r in pq_encode(emb, cb, mode="md5int").collect()
    }
    Cq = np.round(cb * (1 << 20)).astype(np.int64)  # (8, 16, 8)
    for r in emb_pdf.itertuples():
        x = np.asarray(r.embedding, dtype=np.float64)
        # numpy rounds half-to-even; the engines round half-away-from-zero
        q = np.trunc(x * (1 << 20) + np.copysign(0.5, x)).astype(np.int64)
        codes = [
            int(np.argmin(((q[m * 8 : (m + 1) * 8] - Cq[m]) ** 2).sum(axis=1)))
            for m in range(8)
        ]
        assert got[r.vec_id] == codes, r.vec_id


def test_encode_float_agrees_with_numpy(emb, emb_pdf):
    cb = train_pq_codebooks(emb, m_sub=4, n_codes=8, seed=1)
    got = {r["id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    for r in emb_pdf.itertuples():
        x = np.asarray(r.embedding, dtype=np.float64)
        codes = [
            int(np.argmin(((x[m * 16 : (m + 1) * 16] - cb[m]) ** 2).sum(axis=1)))
            for m in range(4)
        ]
        assert got[r.vec_id] == codes, r.vec_id


def test_pq_topk_recall_vs_exact(emb, queries):
    """ADC over 16×64 codebooks must place most true top-5 neighbors in
    its top-20 — a loose recall floor that catches scoring bugs without
    pinning the approximation. Parameters calibrated by an independent
    numpy ADC simulation on this corpus (near-random 64-dim synthetic
    vectors): (8,16)→0.36, (16,16)→0.68, (16,64)→0.92, (32,64)→1.0;
    a correct engine at (16,64) clears 0.8 with margin, a scoring bug
    (wrong LUT join key, dropped subspace, sign flip) lands far below."""
    exact = cosine_topk(emb, queries, k=5)
    approx = pq_topk(emb, queries, k=20, m_sub=16, n_codes=64)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_pq_topk_rerank_scores_are_exact_cosine(emb, queries):
    """With rerank, the surviving pairs' scores must equal the exact
    rounded cosine (same device as cosine_topk)."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in cosine_topk(emb, queries, k=500).collect()
    }
    got = pq_topk(emb, queries, k=5, m_sub=8, n_codes=16, rerank=50).collect()
    assert len(got) == 25
    for r in got:
        assert exact[(r["query_id"], r["neighbor_id"])] == pytest.approx(
            r["score"], abs=1e-9
        )


def test_ivfpq_full_probe_full_rerank_is_exact(emb, queries):
    """n_probe=n_cells + rerank ≥ corpus ⇒ candidates are ALL pairs and
    the exact rerank makes the result identical to cosine_topk — the
    ivf_full_probe exactness anchor extended through the PQ stage."""
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk(emb, queries, k=5).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivfpq_topk(
            emb, queries, k=5, n_cells=8, n_probe=8,
            m_sub=8, n_codes=16, rerank=10**6,
        ).collect()
    )
    assert got == exact


def test_ivfpq_md5int_mode_runs_and_ranks(emb, queries):
    got = ivfpq_topk(
        emb, queries, k=4, n_cells=16, n_probe=4,
        m_sub=8, n_codes=16, mode="md5int",
    )
    rows = got.collect()
    assert rows and set(got.columns) == {"query_id", "neighbor_id", "score", "rank"}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_pq_topk_precomputed_codes_path(emb, queries, tmp_path):
    """codes= (read back from parquet) must reproduce the re-encoded
    result — the production path where the code table is persisted."""
    cb = train_pq_codebooks(emb, m_sub=8, n_codes=16, seed=42, rank_on="md5")
    path = str(tmp_path / "codes")
    pq_encode(emb, cb, mode="md5int").write.parquet(path)
    stored = emb.sparkSession.read.parquet(path)
    a = sorted(
        map(tuple, pq_topk(
            emb, queries, k=5, codebooks=cb, mode="md5int"
        ).collect())
    )
    b = sorted(
        map(tuple, pq_topk(
            emb, queries, k=5, codebooks=cb, codes=stored, mode="md5int"
        ).collect())
    )
    assert a == b
