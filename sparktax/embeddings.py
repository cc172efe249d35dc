"""Pre-trained embedding ingest: ``.npy`` matrices → the D4 DataFrame
schema, plus the name registry.

Reference parity (libs/embeddings.py):

* ``load(model)`` resolves a model *name* through the ``"embeddings"``
  section of ``resources.json`` (``load_registry``, :80-84) — a
  ``"default"`` key names the fallback model; no default and no model →
  ``ValueError`` (:86-97). Here :func:`load` returns the D4 DataFrame
  instead of an ndarray.
* row index = entity id (the OpenKE convention the reference's
  ``ent_embeddings.npy`` files follow, :11-14); ``ids`` overrides.
* ``get_empty_ids`` (:99-103) → :func:`empty_ids` — entities whose vector
  is all zeros (untrained rows), as a DataFrame not a driver set.

Scale design: a ``.npy`` file is an inherently single-machine artifact, so
ingest is a bounded-memory driver-side conversion — ``np.load(mmap)`` →
pyarrow ``ParquetWriter`` chunk by chunk (never the whole matrix in RAM)
— into a parquet sidecar that Spark then reads distributed. Repeat loads
reuse the sidecar (mtime-checked).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktax import schemas


def _ids_digest(ids) -> str:
    """Stable digest of an ``ids`` argument for sidecar freshness checks
    ("default" when row-index ids are implied)."""
    if ids is None:
        return "default"
    import hashlib

    arr = np.asarray(ids, dtype=np.int64)
    return hashlib.md5(arr.tobytes()).hexdigest()


def _read_text(path: str) -> str | None:
    try:
        with open(path) as f:
            return f.read()
    except OSError:
        return None


def npy_to_embeddings(
    spark: SparkSession,
    npy_path: str,
    ids: "np.ndarray | list[int] | None" = None,
    chunk_rows: int = 1 << 16,
    sidecar: str | None = None,
    refresh: bool = False,
) -> DataFrame:
    """Ingest an ``(n, dim)`` float ``.npy`` matrix as the D4 schema
    ``(entity_id long, vector array<float>)``.

    ``ids``: entity id per row (defaults to the row index — reference
    convention). ``sidecar``: parquet path (default ``<npy>.d4.parquet``);
    reused when newer than the ``.npy`` unless ``refresh``.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    sidecar = sidecar or npy_path + ".d4.parquet"
    # the sidecar is only fresh for the SAME ids it was written with: a
    # second call with different ids must rebuild, not silently return
    # the stale mapping (round-4 advice)
    ids_digest = _ids_digest(ids)
    digest_path = sidecar + ".ids"
    fresh = (
        os.path.exists(sidecar)
        and os.path.getmtime(sidecar) >= os.path.getmtime(npy_path)
        and _read_text(digest_path) == ids_digest
    )
    if refresh or not fresh:
        mat = np.load(npy_path, mmap_mode="r")
        if mat.ndim != 2:
            raise ValueError(f"expected a 2-D matrix, got shape {mat.shape}")
        n = mat.shape[0]
        if ids is None:
            ids = np.arange(n, dtype=np.int64)
        else:
            ids = np.asarray(ids, dtype=np.int64)
            if len(ids) != n:
                raise ValueError(f"{len(ids)} ids for {n} matrix rows")
        arrow_schema = pa.schema(
            [("entity_id", pa.int64()), ("vector", pa.list_(pa.float32()))]
        )
        tmp = sidecar + ".tmp"
        with pq.ParquetWriter(tmp, arrow_schema) as w:
            for lo in range(0, n, chunk_rows):
                hi = min(lo + chunk_rows, n)
                block = np.ascontiguousarray(mat[lo:hi], dtype=np.float32)
                vecs = pa.FixedSizeListArray.from_arrays(
                    pa.array(block.reshape(-1)), block.shape[1]
                ).cast(pa.list_(pa.float32()))
                w.write_table(
                    pa.Table.from_arrays(
                        [pa.array(ids[lo:hi]), vecs], schema=arrow_schema
                    )
                )
        os.replace(tmp, sidecar)
        with open(digest_path, "w") as f:
            f.write(ids_digest)
    df = spark.read.parquet(sidecar)
    # parquet list<float> reads back nullable; cast onto the D4 contract
    return df.select(
        F.col("entity_id").cast("long").alias("entity_id"),
        F.col("vector").cast(schemas.EMBEDDINGS["vector"].dataType).alias("vector"),
    )


def load_registry(registry_path: str = "resources.json") -> dict:
    """The ``"embeddings"`` section of ``resources.json`` (reference
    load_registry, libs/embeddings.py:80-84): model name → path, plus an
    optional ``"default"`` name."""
    try:
        with open(registry_path) as f:
            return json.load(f).get("embeddings", {})
    except FileNotFoundError:
        return {}


def register_model(
    name: str, path: str, registry_path: str = "resources.json", default: bool = False
) -> None:
    """Add ``name → path`` to the embeddings registry (and optionally make
    it the default). Creates ``resources.json`` if absent."""
    data: dict = {}
    if os.path.exists(registry_path):
        with open(registry_path) as f:
            data = json.load(f)
    emb = data.setdefault("embeddings", {})
    emb[name] = path
    if default:
        emb["default"] = name
    tmp = registry_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, registry_path)


def load(
    spark: SparkSession,
    model: "str | DataFrame | None" = None,
    registry_path: str = "resources.json",
    ids=None,
) -> DataFrame:
    """One-call ingest by registry name, path, or passthrough (reference
    ``load``, libs/embeddings.py:86-97 — which passes ndarrays through;
    the DataFrame is this engine's ndarray).

    * DataFrame → returned as-is
    * ``None`` → the registry's ``"default"`` model (ValueError if unset,
      same contract as the reference)
    * name found in the registry → its registered path
    * otherwise → treated as a path itself (``.npy`` or parquet dir)
    """
    if isinstance(model, DataFrame):
        return model
    r = load_registry(registry_path)
    if model is None:
        if "default" not in r:
            raise ValueError(
                "Since no default embeddings model is provided in config "
                f"file {registry_path!r}, you must provide a model name or "
                "path to function `load`."
            )
        model = r["default"]
    path = r.get(model, model)
    if isinstance(path, str) and path.endswith(".npy"):
        return npy_to_embeddings(spark, path, ids=ids)
    return spark.read.parquet(path)


def empty_ids(embeddings: DataFrame) -> DataFrame:
    """Entities whose vector is all zeros — untrained/missing rows
    (reference get_empty_ids, libs/embeddings.py:99-103; there a driver
    loop over the matrix, here one Catalyst predicate)."""
    return embeddings.filter(
        ~F.exists("vector", lambda x: x != 0.0)
    ).select("entity_id")
