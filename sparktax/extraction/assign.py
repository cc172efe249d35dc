"""Cluster↔class assignment (driver-side numpy — the F matrix is tiny:
≤ 2·sample_size × n_classes, collected once per task).

The container has no scipy, so ``linear_sum_assignment`` (used by the
reference's hard mapping, libs/extraction/global_max.py:7-20) is
reimplemented: Jonker-Volgenant-style shortest augmenting paths with
potentials, O(min(n,m)²·max(n,m)), rectangular-safe, minimization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment. Returns (row_ind, col_ind) of length
    min(n, m), row_ind sorted ascending — scipy-compatible contract."""
    C = np.asarray(cost, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError("cost must be 2-D")
    transposed = False
    n, m = C.shape
    if n > m:
        C, n, m, transposed = C.T, m, n, True

    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    assigned = np.zeros(m + 1, dtype=np.int64)  # column j → row (1-based); 0 = free
    path = np.zeros(m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        assigned[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = assigned[j0]
            free = ~used
            free[0] = False
            idx = np.nonzero(free)[0]
            cur = C[i0 - 1, idx - 1] - u[i0] - v[idx]
            better = cur < minv[idx]
            minv[idx[better]] = cur[better]
            path[idx[better]] = j0
            j1 = idx[np.argmin(minv[idx])]
            delta = minv[j1]
            u[assigned[used]] += delta
            v[used] -= delta
            minv[free] -= delta
            j0 = j1
            if assigned[j0] == 0:
                break
        while j0:
            j1 = path[j0]
            assigned[j0] = assigned[j1]
            j0 = j1

    rows, cols = [], []
    for j in range(1, m + 1):
        if assigned[j]:
            rows.append(assigned[j] - 1)
            cols.append(j - 1)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if transposed:
        rows, cols = cols, rows
    order = np.argsort(rows, kind="stable")
    return rows[order], cols[order]


def hard_mapping(
    Fm: pd.DataFrame, root_id: int | None = None, allow_root: bool = False
) -> dict:
    """Optimal injective class→cluster map maximizing ΣF1 (reference
    compute_mapping, libs/extraction/global_max.py:7-20). ``Fm``:
    clusters × classes, index = cluster ids, columns = class keys."""
    M = Fm.to_numpy(dtype=np.float64, copy=True)
    if not allow_root:
        if root_id is None:
            raise ValueError("allow_root=False requires root_id")
        M[Fm.index.get_loc(root_id)] = 0.0
    rows, cols = linear_sum_assignment(-M)
    return {
        Fm.columns[c]: int(Fm.index[r]) for r, c in zip(rows, cols)
    }


def greedy_mapping(
    Fm: pd.DataFrame, root_id: int | None = None, allow_root: bool = False
) -> dict:
    """Greedy local-max mapping: per class (column order), best unclaimed
    cluster (reference libs/extraction/local_max.py:6-33)."""
    M = Fm.to_numpy(dtype=np.float64, copy=True)
    if not allow_root:
        if root_id is None:
            raise ValueError("allow_root=False requires root_id")
        M[Fm.index.get_loc(root_id)] = 0.0
    claimed: set[int] = set()
    out: dict = {}
    for ci, cls in enumerate(Fm.columns):
        ranked = np.argsort(-M[:, ci], kind="stable")
        pick = next(r for r in ranked if int(Fm.index[r]) not in claimed)
        clu = int(Fm.index[pick])
        claimed.add(clu)
        out[cls] = clu
    return out
