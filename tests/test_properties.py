"""Property-based tests (hypothesis) for the pure-numpy/python kernels —
no SparkSession needed (SURVEY §5: property-based bullet)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparktax.axioms import parse_axiom
from sparktax.cluster.hac import hac_children, leaf_closure
from sparktax.extraction.assign import linear_sum_assignment
from sparktax.extraction.soft import compress_axioms, margin_prob, softmax_columns
from sparktax.taxonomy import transitive_closure


# ---------------------------------------------------------------- taxonomy
@st.composite
def random_tree(draw):
    n = draw(st.integers(min_value=2, max_value=14))
    # node i's parent is some node < i → always a tree rooted at 0
    return {
        (str(i), str(draw(st.integers(min_value=0, max_value=i - 1))))
        for i in range(1, n)
    }


@given(random_tree())
@settings(max_examples=60, deadline=None)
def test_reduction_closure_roundtrip(tree):
    assert compress_axioms(transitive_closure(tree)) == tree


@given(random_tree())
@settings(max_examples=60, deadline=None)
def test_closure_is_transitive_and_idempotent(tree):
    c = transitive_closure(tree)
    assert transitive_closure(c) == c
    up = {}
    for child, parent in tree:
        up[child] = parent
    # every ancestor pair is present
    for child in up:
        node = child
        while node in up:
            node = up[node]
            assert (child, node) in c


# ---------------------------------------------------------------- softmax / margin-prob
@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=40, deadline=None)
def test_margin_prob_invariants(n, n_types, seed):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 3)
    children, _ = hac_children(X, "ward")
    P = softmax_columns(rng.randn(2 * n - 1, n_types), beta=1.0)
    dP = margin_prob(children, P)
    assert dP.shape == (n_types, n_types)
    assert (dP >= -1e-12).all()
    # dP[i,j] ≤ (Σ_c P[c,i]) bounded by column mass over internal nodes
    assert (dP <= P.sum(axis=0)[:, None] + 1e-9).all()
    # β→∞ softmax is a hard argmax assignment — needs a guaranteed gap
    # between column values (randn can tie to within 1/β, e.g. seed 41)
    M = np.stack([rng.permutation(5) * 0.1 for _ in range(3)], axis=1)
    H = softmax_columns(M, beta=1e4)
    assert np.allclose(H.max(axis=0), 1.0)


# ---------------------------------------------------------------- HAC
@given(
    st.integers(min_value=2, max_value=30),
    st.integers(min_value=1, max_value=4),
    st.sampled_from(["ward", "average", "complete", "single"]),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=40, deadline=None)
def test_hac_is_a_valid_binary_merge_tree(n, d, linkage, seed):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    children, heights = hac_children(X, linkage)
    flat = children.ravel().tolist()
    assert sorted(flat) == list(range(2 * n - 2))  # each id used exactly once
    assert (np.diff(heights) >= -1e-9).all()
    # closure: root covers all leaves exactly once
    cover = [leaf for node, leaf in leaf_closure(children) if node == 2 * n - 2]
    assert sorted(cover) == list(range(n))


# ---------------------------------------------------------------- Hungarian
@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_hungarian_beats_or_ties_greedy(n, m, seed):
    rng = np.random.RandomState(seed)
    C = rng.rand(n, m)
    rows, cols = linear_sum_assignment(C)
    assert len(rows) == min(n, m)
    assert len(set(rows)) == len(rows) and len(set(cols)) == len(cols)
    # optimal ≤ greedy
    greedy = 0.0
    used_r: set[int] = set()
    used_c: set[int] = set()
    flat = sorted(
        ((C[i, j], i, j) for i in range(n) for j in range(m)), key=lambda x: x[0]
    )
    for v, i, j in flat:
        if i not in used_r and j not in used_c:
            greedy += v
            used_r.add(i)
            used_c.add(j)
        if len(used_r) == min(n, m):
            break
    assert C[rows, cols].sum() <= greedy + 1e-9


# ---------------------------------------------------------------- axiom parser
@st.composite
def random_axiom_key(draw, depth=0):
    kind = draw(
        st.sampled_from(
            ["C", "E", "T"] if depth >= 2 else ["C", "E", "T", "AND", "OR", "NOT", "REM"]
        )
    )
    if kind == "T":
        return "T"
    if kind == "C":
        return f"C:{draw(st.integers(min_value=0, max_value=999))}"
    if kind == "E":
        rel = draw(st.integers(min_value=0, max_value=99))
        sub = draw(st.sampled_from(["C", "I", "T"]))
        if sub == "T":
            return f"E:{rel}.T"
        return f"E:{rel}.{sub}:{draw(st.integers(min_value=0, max_value=999))}"
    if kind in ("AND", "OR"):
        n = draw(st.integers(min_value=2, max_value=3))
        kids = sorted({draw(random_axiom_key(depth=depth + 1)) for _ in range(n)})
        if len(kids) < 2:
            return kids[0]
        return f"{kind}({','.join(kids)})"
    if kind == "NOT":
        return f"NOT({draw(random_axiom_key(depth=depth + 1))})"
    base = draw(random_axiom_key(depth=depth + 1))
    subs = sorted({draw(random_axiom_key(depth=depth + 1)) for _ in range(2)})
    return f"REM({base}|{','.join(subs)})"


@given(random_axiom_key())
@settings(max_examples=80, deadline=None)
def test_axiom_parse_serialize_fixpoint(key):
    ax = parse_axiom(key)
    # key() of the parse is itself parseable and stable
    assert parse_axiom(ax.key()).key() == ax.key()


# ---------------------------------------------------------------- rendering
@given(random_tree())
@settings(max_examples=60, deadline=None)
def test_render_tree_properties(edges):
    """Every node renders exactly once on its own line; connector counts
    match the edge count; depth clipping drops exactly the deep nodes."""
    from sparktax.tree import Tree
    from sparktax.viz import render_tree, tree_dot

    t = Tree.from_edges(edges)
    lines = render_tree(t).splitlines()
    nodes = list(t.parent)
    assert len(lines) == len(nodes)
    for n in nodes:
        # the label appears as a whole drawing token exactly once
        hits = [ln for ln in lines if ln.strip("│ ┌└├┤┐").split("┤")[0].split("┐")[0] == str(n)]
        assert len(hits) == 1, f"node {n} rendered {len(hits)} times"
    starts = sum(ln.count("┌") + ln.count("└") + ln.count("├") for ln in lines)
    assert starts == len(edges)  # one connector per child edge

    clipped = render_tree(t, max_depth=1)
    want = {n for n in nodes if t.depth(n) <= 1}
    assert len(clipped.splitlines()) == len(want)

    dot = tree_dot(t)
    assert dot.count("->") == len(edges)
