"""Axiom algebra, induction kernel, and the expressive extractor end-to-end
on a KG where individuals are separable ONLY by class expressions."""

from __future__ import annotations

import numpy as np
import pytest

from sparktax import synth
from sparktax.axioms import And, Concept, Existential, Neg, Or, Remainder, Top, parse_axiom
from sparktax.graph import KnowledgeGraph
from sparktax.induction import LocalInducer


# ------------------------------------------------------------------ algebra
def test_axiom_keys_roundtrip():
    cases = [
        Top(),
        Concept(12),
        Existential(3, cls=7),
        Existential(3, tgt=99),
        Existential(3),
        And((Concept(1), Existential(2, cls=3))),
        Or((Concept(1), Concept(2))),
        Neg(Concept(5)),
        Remainder(Concept(1), (Concept(2), Existential(3, cls=4))),
        And((Or((Concept(1), Concept(2))), Neg(Existential(9)))),
    ]
    for ax in cases:
        assert parse_axiom(ax.key()) == ax, ax.key()


def test_axiom_algebra_canonical():
    a, b = Concept(1), Concept(2)
    assert (a & b) == (b & a)
    assert (a | b) == (b | a)
    assert ((a & b) & a) == (a & b)  # dedup
    assert ~(~a) == a


@pytest.fixture(scope="module")
def ekg(spark):
    triples, entities, relations, info = synth.gen_expressive_kg_pdf()
    kg = KnowledgeGraph(
        spark.createDataFrame(triples),
        spark.createDataFrame(entities),
        spark.createDataFrame(relations),
    ).cache()
    return kg, triples, info


def test_extensions_match_pandas(ekg):
    kg, triples, info = ekg
    # Concept extension
    got = set(Concept(info["Book"]).extension(kg).toPandas()["h"])
    want = set(triples[(triples.r == 0) & (triples.t == info["Book"])].h)
    assert got == want
    # Existential ∃wrote.Poem
    ax = Existential(info["WROTE"], cls=info["Poem"])
    got = set(ax.extension(kg).toPandas()["h"])
    poems = set(triples[(triples.r == 0) & (triples.t == info["Poem"])].h)
    want = set(triples[(triples.r == info["WROTE"]) & triples.t.isin(poems)].h)
    assert got == want and got == set(info["groups"]["poet"])
    # And / Or / Remainder consistency
    wb = Existential(info["WROTE"], cls=info["Book"])
    both = And((wb, ax))
    assert set(both.extension(kg).toPandas()["h"]) == got
    rem = Remainder(wb, (ax,))
    assert set(rem.extension(kg).toPandas()["h"]) == set(info["groups"]["novelist"])


# ------------------------------------------------------------------ inducer
def test_local_inducer_simple():
    # 10 pos, 10 neg; atom0 = exactly positives; atom1 = noise
    rng = np.random.RandomState(0)
    A = np.zeros((20, 3), dtype=bool)
    A[:10, 0] = True
    A[:, 1] = rng.rand(20) < 0.5
    A[5:15, 2] = True
    mask = np.zeros(20, dtype=bool)
    mask[:10] = True
    ind = LocalInducer(A, ["C:0", "C:1", "C:2"], mask)
    rec = ind.best(threshold=0.9, max_axioms=2, min_gain=0.05, keep_n=5)
    assert rec is not None
    assert rec["axiom"] == "C:0"
    assert rec["cov"] == 1.0 and rec["spe"] == 1.0


def test_local_inducer_needs_or():
    # positives = atom0 ∪ atom1 (each covers half) → needs OR of both
    A = np.zeros((30, 2), dtype=bool)
    A[:8, 0] = True
    A[8:16, 1] = True
    mask = np.zeros(30, dtype=bool)
    mask[:16] = True
    ind = LocalInducer(A, ["C:0", "C:1"], mask)
    rec = ind.best(threshold=0.95, max_axioms=2, min_gain=0.05, keep_n=5)
    assert rec is not None
    assert rec["axiom"] == "OR(C:0,C:1)"


def test_local_inducer_needs_and():
    # positives = atom0 ∩ atom1
    A = np.zeros((40, 2), dtype=bool)
    A[:20, 0] = True
    A[10:30, 1] = True
    mask = np.zeros(40, dtype=bool)
    mask[10:20] = True
    ind = LocalInducer(A, ["C:0", "C:1"], mask)
    rec = ind.best(threshold=0.95, max_axioms=2, min_gain=0.01, keep_n=5)
    assert rec is not None
    assert rec["axiom"] == "AND(C:0,C:1)"
    assert rec["sco"] == pytest.approx(1.0)


# ------------------------------------------------------------------ end-to-end
def test_expressive_extractor_finds_planted_expressions(ekg):
    from sparktax.expressive import ExpressiveExtractor, ExpressiveParams
    from sparktax.typevec import type_vectors

    kg, triples, info = ekg
    emb = type_vectors(kg, k=16).localCheckpoint()
    params = ExpressiveParams(
        size=500, min_size=25, max_waves=3, threshold_initial=0.9, seed=1
    )
    ex = ExpressiveExtractor(kg, emb, params)
    edges = ex.run()
    assert edges, "no taxonomy extracted"
    keys = {c for c, _ in edges}
    wrote, plays, loc = info["WROTE"], info["PLAYS"], info["LOC"]

    def found(rel, cls):
        tag = f"E:{rel}.C:{cls}"
        return any(tag in k for k in keys)

    assert found(plays, info["Instrument"]), edges
    assert found(loc, info["Country"]), edges
    assert found(wrote, info["Book"]) or (
        found(wrote, info["Poem"]) and found(wrote, info["Novel"])
    ), edges
    # depth-2 refinement: the Poem and Novel expressions must appear as
    # children of a parent mentioning the Book expression
    book_tag = f"E:{wrote}.C:{info['Book']}"
    for cls in (info["Poem"], info["Novel"]):
        tag = f"E:{wrote}.C:{cls}"
        assert any(
            tag in c and book_tag in p for c, p in edges
        ), (tag, edges)
