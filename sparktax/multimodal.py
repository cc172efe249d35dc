"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with real Spark plumbing (schemas, partitioning, Arrow batch
shapes) and STUBBED codecs.

The container has no image/audio libraries, so the decode step is either a
clearly-marked ``NotImplementedError`` (``decoder="real"``) or a
deterministic fake (``decoder="fake"``, hash-seeded) that preserves the
exact UDF signatures and batch shapes a real decoder would use. Swapping in
PIL/torchaudio on a production cluster changes ONLY ``_decode_real``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

_FEAT_DIM = 16
_FEATURE_OUT = "media_id long, kind string, feature array<float>, n_bytes long"
_FRAME_OUT = "media_id long, frame_idx int, frame array<float>"


def gen_media_pdf(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table: payload = seeded random bytes."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.randint(64, 512)))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.randint(16, 256)) if kind != "audio" else None,
                int(rng.randint(16, 256)) if kind != "audio" else None,
                int(rng.randint(100, 60000)) if kind != "image" else None,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"],
    )


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; deploy with decoder='fake' for plumbing tests or add "
        "PIL/av on the cluster and implement this hook"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: feature = normalized bytes of sha256(payload)."""
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(h[:_FEAT_DIM], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """(media_id, kind, feature[16], n_bytes) via Arrow-batched
    ``mapInPandas`` — the exact shape a real embed-the-bytes pipeline uses
    (zero-shuffle narrow map over the binary column)."""
    decode = {"fake": _decode_fake, "real": _decode_real}[decoder]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p, k).tolist() for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=_FEATURE_OUT
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, decoder: str = "fake"
) -> DataFrame:
    """(media_id, frame_idx, frame[16]) for video rows — frame sampling
    plumbing: one output row per sampled timestamp, frames decoded per
    Arrow batch."""
    decode = {"fake": _decode_fake, "real": _decode_real}[decoder]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                dur = int(r.duration_ms or 0)
                n_frames = min(max(dur // every_ms, 1), max_frames)
                for fi in range(n_frames):
                    seed = (r.payload or b"") + fi.to_bytes(4, "little")
                    out.append((r.media_id, fi, decode(seed, "video").tolist()))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    )
    return vids.mapInPandas(gen, schema=_FRAME_OUT)


def resize_metadata(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Pure-SQL resize bookkeeping: target dims preserving aspect ratio
    (the decode-free half of a resize stage — real pixel work happens in
    :func:`extract_features`-style kernels)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )
