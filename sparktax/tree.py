"""Driver-side tree utilities (reference libs/tree/base.py,
libs/taxonomy/_tax.py). Taxonomies are ≤ hundreds of edges (reference
data/taxonomy/full.txt = 589), so navigation/surgery is plain Python on
collected edges; only closure/evaluation have DataFrame twins
(sparktax.taxonomy).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Callable, Iterable


class Tree:
    """Rooted tree over hashable node ids: parent map + children map."""

    def __init__(self, root):
        self.root = root
        self.parent: dict = {root: None}
        self.children: dict = {root: []}

    # ------------------------------------------------------------ build
    @classmethod
    def from_edges(cls, edges: Iterable[tuple], add_root=None) -> "Tree":
        """(child, parent) pairs → Tree. Multi-root inputs require
        ``add_root`` (a synthetic root is attached over every top node);
        cycles raise (reference from_edges, libs/tree/base.py:110-142)."""
        edges = list(edges)
        children = {c for c, _ in edges}
        parents = {p for _, p in edges}
        roots = parents - children
        if not roots:
            raise ValueError("Tree contains a cycle")
        if len(roots) > 1:
            if add_root is None:
                raise ValueError(
                    "Tree contains several roots. Set 'add_root'"
                )
            edges = edges + [(r, add_root) for r in sorted(roots, key=str)]
            roots = {add_root}
        t = cls(roots.pop())
        for c, p in edges:
            t.attach(c, p)
        # cycle check: every node must reach the root
        for n in list(t.parent):
            seen = set()
            x = n
            while x is not None:
                if x in seen:
                    raise ValueError(f"Tree contains a cycle involving {x}")
                seen.add(x)
                x = t.parent.get(x)
        return t

    @classmethod
    def from_df(
        cls,
        df,
        child: str = "child",
        parent: str = "parent",
        add_root=None,
    ) -> "Tree":
        """Collect a taxonomy edge DataFrame — e.g. the pipeline's
        ``60_taxonomy`` output or :func:`extract_taxonomy` edges — into a
        navigable/renderable Tree. Taxonomies are ≤ hundreds of edges, so
        the collect is bounded by construction."""
        rows = df.select(child, parent).collect()
        return cls.from_edges(
            sorted((r[0], r[1]) for r in rows), add_root=add_root
        )

    def to_edges(self) -> list[tuple]:
        return [(c, p) for c, p in self.parent.items() if p is not None]

    # ------------------------------------------------------------ surgery
    def attach(self, node, parent) -> None:
        self.parent.setdefault(parent, None)
        self.children.setdefault(parent, [])
        self.parent[node] = parent
        self.children.setdefault(node, [])
        self.children[parent].append(node)

    def detach(self, node) -> None:
        """Detach ``node`` (and its subtree) from its parent
        (reference detach, libs/tree/base.py:290-331)."""
        p = self.parent.get(node)
        if p is not None:
            self.children[p].remove(node)
        self.parent[node] = None

    def move(self, node, new_parent) -> None:
        if node == new_parent or self.is_ancestor(node, new_parent):
            raise ValueError("cannot move a node under its own subtree")
        self.detach(node)
        self.parent[node] = new_parent
        self.children.setdefault(new_parent, []).append(node)

    # ------------------------------------------------------------ queries
    def depth(self, node) -> int:
        d = 0
        while self.parent.get(node) is not None:
            node = self.parent[node]
            d += 1
        return d

    def is_ancestor(self, anc, node) -> bool:
        while node is not None:
            if node == anc:
                return True
            node = self.parent.get(node)
        return False

    def branch(self, node) -> list:
        """Root path, node-first (reference Taxonomy.branch,
        libs/taxonomy/_tax.py:58-91)."""
        out = [node]
        while self.parent.get(node) is not None:
            node = self.parent[node]
            out.append(node)
        return out

    def bfs(
        self,
        start=None,
        max_depth: int | None = None,
        max_nodes: int | None = None,
        halt: Callable | None = None,
    ):
        """(reference Node.bfs, libs/tree/base.py:253-288)."""
        start = self.root if start is None else start
        q = deque([(start, 0)])
        n = 0
        while q:
            node, d = q.popleft()
            if max_depth is not None and d > max_depth:
                continue
            yield node
            n += 1
            if max_nodes is not None and n >= max_nodes:
                return
            if halt is not None and halt(node):
                return
            for c in self.children.get(node, []):
                q.append((c, d + 1))

    def dfs(self, start=None):
        start = self.root if start is None else start
        stack = [start]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(self.children.get(node, [])))

    def clip_at(self, depth: int) -> dict:
        """node → its ancestor at the given depth (class-equivalence at
        depth k; reference clip_at, libs/taxonomy/_tax.py:58-91)."""
        out = {}
        for node in self.parent:
            b = self.branch(node)  # node..root
            if len(b) - 1 <= depth:
                out[node] = node
            else:
                out[node] = b[len(b) - 1 - depth]
        return out

    def leaves(self) -> list:
        return [n for n, cs in self.children.items() if not cs]

    # ------------------------------------------------------------ display
    def render(self, **kwargs) -> str:
        """ASCII pretty-print, balanced up/down layout (reference
        ``Node.print(as_string=True)``, libs/tree/base.py:342-361 →
        libs/tree/pprint.py). kwargs: start, name, max_depth, halt."""
        from sparktax.viz import render_tree

        return render_tree(self, **kwargs)

    def print(self, **kwargs) -> None:
        """Print :meth:`render` (the reference ``Node.print`` default)."""
        print(self.render(**kwargs))

    def html(self, **kwargs) -> str:
        """Self-contained HTML rendering with hover tooltips (reference
        libs/viz/taxonomy.py print_html); see :func:`sparktax.viz.tree_html`."""
        from sparktax.viz import tree_html

        return tree_html(self, **kwargs)

    def _repr_html_(self) -> str:  # notebook display hook
        return self.html()


# ------------------------------------------------------------------ edge IO
def write_edge_list(edges: Iterable[tuple], path: str) -> None:
    """Two-column text edge list (reference write_edge_list,
    libs/tree/base.py:158-170)."""
    with open(path, "w", encoding="utf8") as f:
        for c, p in edges:
            print(c, p, file=f)


def read_edge_list(path: str, preprocess: Callable | None = None) -> list[tuple]:
    out = []
    with open(path, encoding="utf8") as f:
        for line in f:
            c, p = line.split()
            if preprocess:
                c, p = preprocess(c), preprocess(p)
            out.append((c, p))
    return out
