"""Independent recompute of the `media_features` gold (round-4 verdict
item 4: the gate's one self-referential gold, `__spark_entry__._MEDIA_GOLD_SQL`,
was a snapshot of the engine's own output — this test upgrades it to an
oracle by recomputing f0/f2 with a second, naive numpy path that shares
NO code with `sparktax/multimodal.py`'s kernel):

* PPM decode: a fresh 3-line header parse (the fixture writes exactly
  ``P6\\n{w} {h}\\n255\\n``), not `decode_ppm`.
* WAV decode: the **stdlib ``wave`` module**, not `decode_wav`.
* features: plain float64 expressions — f0 = mean(R)/rms, f2 = mean(B)/peak.

Tolerance contract: the gold literals are the float32 kernel's output
rounded to 5 dp, and float32-vs-float64 accumulation order differs by one
ulp at the 5th decimal on a few image rows (measured: 3/40 rows off by
exactly 1e-5). The independent check therefore asserts agreement within
ONE quantum (1e-5); any genuine decode/feature regression moves values by
orders of magnitude more. n_bytes is asserted exactly.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

duckdb = pytest.importorskip("duckdb")


def _naive_f0_f2(payload: bytes, kind: str) -> tuple[float, float]:
    if kind == "image":
        # fixture header is exactly b"P6\n{w} {h}\n255\n" (no comments)
        hdr_end = payload.index(b"255\n") + 4
        w, h = (int(x) for x in payload[3 : payload.index(b"\n255")].split())
        px = np.frombuffer(payload[hdr_end : hdr_end + w * h * 3], np.uint8)
        px = px.reshape(h, w, 3).astype(np.float64) / 255.0
        return float(px[:, :, 0].mean()), float(px[:, :, 2].mean())
    with wave.open(io.BytesIO(payload)) as wv:
        assert wv.getnchannels() == 1 and wv.getsampwidth() == 2
        frames = wv.readframes(wv.getnframes())
    s = np.frombuffer(frames, "<i2").astype(np.float64) / 32767.0
    return float(np.sqrt((s * s).mean())), float(np.abs(s).max())


def _gold_rows() -> dict[int, tuple]:
    import __spark_entry__ as E

    return {
        r[0]: r for r in duckdb.sql(E._MEDIA_GOLD_SQL).fetchall()
    }  # media_id -> (media_id, kind, n_bytes, f0, f2)


def test_media_gold_independent_recompute():
    from sparktax.multimodal import gen_media_pdf

    pdf = gen_media_pdf(60, seed=9, real_payloads=True)
    pdf = pdf[pdf["kind"] != "video"]
    gold = _gold_rows()
    assert set(gold) == set(pdf["media_id"])
    quantum = 1e-5 + 1e-9  # one 5-dp rounding quantum
    for r in pdf.itertuples(index=False):
        g = gold[r.media_id]
        assert g[1] == r.kind
        assert g[2] == len(r.payload)  # exact
        f0, f2 = _naive_f0_f2(r.payload, r.kind)
        assert abs(round(f0, 5) - g[3]) <= quantum, (r.media_id, f0, g[3])
        assert abs(round(f2, 5) - g[4]) <= quantum, (r.media_id, f2, g[4])


def test_media_gold_matches_engine(spark):
    """Engine → gold exact (the gate's own comparison, kept here so the
    three-way cross-check — engine == gold ≈ naive — lives in one place)."""
    import __spark_entry__ as E

    got = {
        r.media_id: r
        for r in E._raw_queries()["media_features"](spark, "unused").collect()
    }
    gold = _gold_rows()
    assert set(got) == set(gold)
    for mid, g in gold.items():
        r = got[mid]
        assert (r.kind, r.n_bytes) == (g[1], g[2])
        # engine values are float32 (feature array<float> → round keeps
        # the float32 representation, e.g. 0.32787 → 0.3278700113);
        # the gate's DuckDB compare casts both sides identically, here we
        # allow one float32 ulp (~3e-8 at these magnitudes)
        assert r.f0 == pytest.approx(g[3], abs=1e-7)
        assert r.f2 == pytest.approx(g[4], abs=1e-7)
