"""Soft (probabilistic) mapping: softmax over F, margin probabilities over
the dendrogram, greedy cycle-free taxonomy insertion, transitive reduction.

All driver-side numpy over collected small structures (≤ 2·sample_size
nodes, n_classes ≤ hundreds) — mirrors the reference's deliberate choice
(libs/extraction/probabilistic.py; the O(n) iterative margin-prob at
:55-70 replaces an exponential recursion).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd


def softmax_columns(M: np.ndarray, beta: float = 1.0) -> np.ndarray:
    """Column-wise softmax: P[i,j] = exp(βM[i,j]) / Σᵢ' exp(βM[i',j])."""
    e = np.exp(beta * (M - M.max(axis=0, keepdims=True)))  # stabilized
    return e / e.sum(axis=0, keepdims=True)


def margin_prob(children: np.ndarray, P: np.ndarray) -> np.ndarray:
    """dP[t_parent, t_child] = Σ_c P[c, t_parent] · S_subtree(c)[t_child]
    where S_subtree(c) sums P over the *proper descendants* of c.

    ``children``: (n-1, 2) merge table (node n+k ← children[k]); since
    child ids are always < parent ids, one ascending pass is the
    topological order (reference optim_margin_prob,
    libs/extraction/probabilistic.py:55-70).
    """
    n = len(children) + 1
    n_nodes, n_types = P.shape
    assert n_nodes == 2 * n - 1, (n_nodes, n)
    S = np.zeros_like(P)
    S[:n] = P[:n]  # leaf subtree-sum = own probability
    dP = np.zeros((n_types, n_types))
    for k in range(n - 1):
        node = n + k
        a, b = children[k]
        sub = S[a] + S[b]
        dP += np.outer(P[node], sub)
        S[node] = sub + P[node]
    return dP


def _has_path(start, goal, kids: dict) -> bool:
    """Directed reachability start→goal over a parent→children map."""
    stack = [start]
    seen = set()
    while stack:
        x = stack.pop()
        if x == goal:
            return True
        if x in seen:
            continue
        seen.add(x)
        stack.extend(kids.get(x, ()))
    return False


def build_taxonomy(
    class_keys: list, dP: np.ndarray, threshold: float = 0.5, compress: bool = True
) -> set[tuple]:
    """Greedy cycle-free insertion of (child ⊑ parent) axioms in descending
    probability, then optional transitive reduction (reference
    build_taxonomy, probabilistic.py:151-167)."""
    cand = [
        ((class_keys[j], class_keys[i]), dP[i, j])
        for i in range(len(class_keys))
        for j in range(len(class_keys))
        if i != j and dP[i, j] >= threshold
    ]
    cand.sort(key=lambda x: -x[1])
    kids: dict = defaultdict(set)
    tree: set[tuple] = set()
    weights: dict = {}
    for (child, parent), p in cand:
        # inserting child⊑parent is a cycle iff parent is (transitively)
        # below child already
        if _has_path(child, parent, kids):
            continue
        tree.add((child, parent))
        weights[(child, parent)] = p
        kids[parent].add(child)
    if compress:
        return compress_axioms(tree, weights)
    return tree


def _root_paths(node, up: dict) -> list[list]:
    """All paths node→root in the DAG given child→parents map."""
    parents = up.get(node, ())
    if not parents:
        return [[node]]
    out = []
    for p in parents:
        for tail in _root_paths(p, up):
            out.append([node, *tail])
    return out


def compress_axioms(axioms: set[tuple], weights: dict | None = None) -> set[tuple]:
    """Transitive reduction of a DAG to a tree: keep, per node, only the
    first edge of its heaviest (or longest) root-path (reference
    compress_axioms, probabilistic.py:109-133)."""
    if not axioms:
        return set()
    up: dict = defaultdict(set)
    nodes = set()
    for child, parent in axioms:
        up[child].add(parent)
        nodes.update((child, parent))

    def path_weight(path: list) -> float:
        if weights is None:
            return float(len(path))
        return sum(weights[(a, b)] for a, b in zip(path, path[1:]))

    reduced: set[tuple] = set()
    for node in nodes:
        paths = _root_paths(node, up)
        best = max(enumerate(paths), key=lambda ip: (path_weight(ip[1]), ip[0]))[1]
        if len(best) > 1:
            reduced.add((node, best[1]))
    return reduced


def soft_mapping(
    Fm: pd.DataFrame,
    children: np.ndarray,
    beta: float = 100.0,
    threshold: float = 0.1,
    compress: bool = True,
) -> set[tuple]:
    """F matrix + dendrogram → taxonomy edges (the full soft path,
    reference extract_axioms, probabilistic.py:259-263)."""
    P = softmax_columns(Fm.to_numpy(dtype=np.float64), beta=beta)
    dP = margin_prob(children, P)
    return build_taxonomy(list(Fm.columns), dP, threshold=threshold, compress=compress)
