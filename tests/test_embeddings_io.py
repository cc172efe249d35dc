"""`.npy` embedding ingest + model registry (reference libs/embeddings.py:
16-57 registry, 86-97 load, 99-103 get_empty_ids). Closes SURVEY O6's
missing half: pre-trained TransE/RDF2Vec-style matrices → D4 schema."""

from __future__ import annotations

import numpy as np
import pytest

from sparktax import embeddings as emb


@pytest.fixture()
def npy_file(tmp_path):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(50, 8)).astype(np.float32)
    mat[13] = 0.0  # an untrained row
    p = tmp_path / "ent_embeddings.npy"
    np.save(p, mat)
    return str(p), mat


def test_npy_roundtrip_values_and_schema(spark, npy_file):
    path, mat = npy_file
    df = emb.npy_to_embeddings(spark, path, chunk_rows=16)  # >1 chunk
    assert [f.name for f in df.schema.fields] == ["entity_id", "vector"]
    rows = {r.entity_id: r.vector for r in df.collect()}
    assert set(rows) == set(range(50))
    np.testing.assert_allclose(np.array(rows[3]), mat[3], rtol=1e-6)
    np.testing.assert_allclose(np.array(rows[49]), mat[49], rtol=1e-6)


def test_npy_custom_ids_and_sidecar_reuse(spark, npy_file, tmp_path):
    import os

    path, mat = npy_file
    ids = np.arange(50) * 10
    df = emb.npy_to_embeddings(spark, path, ids=ids)
    assert df.agg({"entity_id": "max"}).first()[0] == 490
    sidecar = path + ".d4.parquet"
    stamp = os.path.getmtime(sidecar)
    emb.npy_to_embeddings(spark, path, ids=ids).count()  # reuse, no rewrite
    assert os.path.getmtime(sidecar) == stamp
    # CHANGED ids must invalidate the sidecar (round-4 advice: a stale
    # sidecar used to win silently) — new mapping, not the old one
    ids2 = np.arange(50) * 10 + 1
    df2 = emb.npy_to_embeddings(spark, path, ids=ids2)
    assert df2.agg({"entity_id": "max"}).first()[0] == 491
    assert os.path.getmtime(sidecar) > stamp
    # and dropping back to default row-index ids rebuilds again
    df3 = emb.npy_to_embeddings(spark, path)
    assert df3.agg({"entity_id": "max"}).first()[0] == 49
    with pytest.raises(ValueError, match="ids"):
        emb.npy_to_embeddings(spark, path, ids=[1, 2], refresh=True)


def test_registry_load_and_default(spark, npy_file, tmp_path):
    path, mat = npy_file
    reg = str(tmp_path / "resources.json")
    # no default registered → the reference's ValueError contract
    with pytest.raises(ValueError, match="default embeddings model"):
        emb.load(spark, None, registry_path=reg)
    emb.register_model("TransE_50d_100e", path, registry_path=reg, default=True)
    assert emb.load_registry(reg)["default"] == "TransE_50d_100e"
    by_name = emb.load(spark, "TransE_50d_100e", registry_path=reg)
    by_default = emb.load(spark, None, registry_path=reg)
    by_path = emb.load(spark, path, registry_path=reg)
    assert by_name.count() == by_default.count() == by_path.count() == 50
    # DataFrame passthrough (reference passes ndarrays through)
    assert emb.load(spark, by_name, registry_path=reg) is by_name


def test_empty_ids(spark, npy_file):
    path, _ = npy_file
    df = emb.npy_to_embeddings(spark, path)
    assert [r.entity_id for r in emb.empty_ids(df).collect()] == [13]
