"""ResultDict / AxiomRecord parity (reference results.py:7-116)."""

from __future__ import annotations

import numpy as np

from sparktax.induction import LocalInducer
from sparktax.results import AxiomRecord, ResultDict, is_composed, is_concept, is_neg


def _rd():
    rd = ResultDict()
    rd[0].append(AxiomRecord("C:1", 1.0, 0.6, 0.75, 0))
    rd[0].append(AxiomRecord("E:7.C:2", 0.8, 0.9, 0.85, 0))
    rd[1].append(AxiomRecord("AND(C:1,E:7.C:2)", 0.9, 0.95, 0.92, 1))
    rd[1].append(AxiomRecord("NOT(C:3)", 0.5, 0.5, 0.5, 1))
    return rd


def test_key_predicates():
    assert is_concept("C:1") and not is_concept("E:7.C:2")
    assert is_neg("NOT(C:3)") and not is_neg("C:3")
    assert is_composed("AND(C:1,C:2)") and is_composed("OR(C:1,C:2)")
    assert not is_composed("E:7.C:2")


def test_flatten_default_excludes_concepts():
    keys = {r.axiom for r in _rd().flatten()}
    assert "C:1" not in keys
    assert keys == {"E:7.C:2", "AND(C:1,E:7.C:2)", "NOT(C:3)"}


def test_ranked_and_best():
    rd = _rd()
    ranked = rd.ranked()
    assert [r.axiom for r in ranked] == ["AND(C:1,E:7.C:2)", "E:7.C:2", "NOT(C:3)"]
    assert rd.best().axiom == "AND(C:1,E:7.C:2)"
    assert rd.best(exclude_composed=True).axiom == "E:7.C:2"
    assert [r.axiom for r in rd.n_best(2)] == ["AND(C:1,E:7.C:2)", "E:7.C:2"]


def test_pos_neg_split():
    rd = _rd()
    pos = rd.pos_only()
    neg = rd.neg_only()
    assert all(not is_neg(r.axiom) for r in pos.flatten(exclude_concepts=False))
    assert {r.axiom for r in neg.flatten()} == {"NOT(C:3)"}
    # split preserves the per-step structure
    assert set(pos) <= set(rd)


def test_inducer_find_results_steps():
    A = np.zeros((30, 2), dtype=bool)
    A[:8, 0] = True
    A[8:16, 1] = True
    mask = np.zeros(30, dtype=bool)
    mask[:16] = True
    ind = LocalInducer(A, ["E:1.C:0", "E:2.C:1"], mask)
    rd = ind.find_results(threshold=0.95, max_axioms=2, min_gain=0.05, keep_n=5)
    assert 0 in rd and 1 in rd  # atoms at step 0, the OR at step 1
    assert rd.best().axiom == "OR(E:1.C:0,E:2.C:1)"
    assert rd.best().step == 1
