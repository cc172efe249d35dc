"""Nearest-selected-ancestor contraction: mapping → taxonomy edges."""

from __future__ import annotations


def mapping_to_axioms(
    cls_to_clu: dict,
    parent_of: dict[int, int],
    root_id: int,
    skip_direct_parent: bool = False,
) -> set[tuple]:
    """Contract the dendrogram onto the mapped clusters: for each mapped
    cluster, walk up to the nearest *other* mapped ancestor → subsumption
    edge (child_class ⊑ ancestor_class).

    Parity note: the reference starts the check at the **grandparent**
    (libs/extraction/common.py:7-13 advances once before testing), so a
    mapped *direct* parent is silently skipped. ``skip_direct_parent=True``
    reproduces that behavior bit-for-bit for parity runs; the default is
    the corrected walk (nearest mapped ancestor including the parent).
    """
    selected = {clu: cls for cls, clu in cls_to_clu.items()}
    axioms: set[tuple] = set()
    for cls, node in cls_to_clu.items():
        if node == root_id:
            continue
        walker = parent_of[node]
        if skip_direct_parent:
            while walker != root_id:
                walker = parent_of[walker]
                if walker in selected:
                    axioms.add((cls, selected[walker]))
                    break
        else:
            while True:
                if walker in selected:
                    axioms.add((cls, selected[walker]))
                    break
                if walker == root_id:
                    break
                walker = parent_of[walker]
    return axioms
