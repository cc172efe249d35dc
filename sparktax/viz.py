"""Tree rendering: ASCII pretty-print + self-contained HTML.

The reference's inspection surface (reference libs/tree/pprint.py:1-72,
used by ``Node.print``, libs/tree/base.py:342-361; HTML variant
libs/viz/taxonomy.py:16-103) draws a *horizontal* tree: children are
split into a balanced "up" half (printed above the node) and "down"
half (printed below), so the root sits mid-height and deep taxonomies
stay readable. Same layout algorithm here, driver-side over
:class:`sparktax.tree.Tree` (taxonomies are ≤ hundreds of nodes).

The reference's plotly/networkx dendrogram (libs/viz/tree.py,
libs/viz/nary_tree.py) needs plotting libs this sandbox doesn't ship;
:func:`tree_dot` covers that inspection need with a Graphviz DOT export
(renderable anywhere), gated behind no imports at all.
"""

from __future__ import annotations

import html as _html
from collections.abc import Callable

from sparktax.tree import Tree

_START = {"up": "┌", "down": "└", "updown": " ", "": "├"}


def _subtree_sizes(tree: Tree, node, sizes: dict) -> int:
    n = 1 + sum(_subtree_sizes(tree, c, sizes) for c in tree.children.get(node, []))
    sizes[node] = n
    return n


def _split_balanced(tree: Tree, node, sizes: dict) -> tuple[list, list]:
    """Children split into (up, down): 'up' holds the smallest subtrees
    ascending, 'down' takes the largest until it outweighs 'up' — the
    reference's mid-anchored layout (libs/tree/pprint.py:41-45)."""
    up = sorted(tree.children.get(node, []), key=lambda c: (sizes[c], str(c)))
    down: list = []
    while up and sum(sizes[c] for c in down) < sum(sizes[c] for c in up):
        down.append(up.pop())
    return up, down


def _render(
    tree: Tree,
    node,
    name: Callable,
    indent: str,
    last: str,
    max_depth: int | None,
    halt: Callable | None,
    lines: list[str],
    sizes: dict,
    space: str,
    bar: str,
    decorate: Callable,
) -> None:
    expand = not (max_depth == 0 or (halt is not None and halt(node)))
    next_depth = None if max_depth is None else max_depth - 1
    up, down = _split_balanced(tree, node, sizes) if expand else ([], [])
    pad = space * len(name(node))

    for i, child in enumerate(up):
        nxt = indent + (space if "up" in last else bar) + pad
        _render(tree, child, name, nxt, "up" if i == 0 else "", next_depth,
                halt, lines, sizes, space, bar, decorate)

    end = "┤" if up else ("┐" if down else "")
    lines.append(indent + _START[last] + decorate(node) + end)

    for i, child in enumerate(down):
        nxt = indent + (space if "down" in last else bar) + pad
        _render(tree, child, name, nxt, "down" if i == len(down) - 1 else "",
                next_depth, halt, lines, sizes, space, bar, decorate)


def render_tree(
    tree: Tree,
    start=None,
    name: Callable | None = None,
    max_depth: int | None = None,
    halt: Callable | None = None,
) -> str:
    """ASCII rendering of ``tree`` (reference print_tree semantics:
    balanced up/down halves, box-drawing connectors, ``max_depth`` /
    ``halt`` pruning). ``name`` maps node → label (default ``str``)."""
    name = name or str
    start = tree.root if start is None else start
    sizes: dict = {}
    _subtree_sizes(tree, start, sizes)
    lines: list[str] = []
    _render(tree, start, name, "", "updown", max_depth, halt, lines, sizes,
            " ", "│", name)
    return "\n".join(lines)


def print_tree(tree: Tree, **kwargs) -> None:
    """Print :func:`render_tree` (the reference ``Node.print`` default)."""
    print(render_tree(tree, **kwargs))


# ------------------------------------------------------------------ HTML

_TREE_CSS = """<style>
.sparktax-tree { font-family: monospace; }
.sparktax-tree .line { margin: 0; padding: 0; white-space: nowrap; }
.sparktax-tree .box { display: inline-block; position: relative; }
.sparktax-tree .box.hovered { color: #00008b; cursor: pointer; }
.sparktax-tree .box .tip { display: none; position: absolute; left: 0;
  top: 1.2em; padding: 2px 8px; border: 1px solid #888; border-radius: 3px;
  background: #fff; white-space: nowrap; z-index: 10; }
.sparktax-tree .box:hover .tip { display: block; }
</style>"""


def tree_html(
    tree: Tree,
    start=None,
    name: Callable | None = None,
    hover: Callable | None = None,
    max_depth: int | None = None,
    halt: Callable | None = None,
    filename: str | None = None,
) -> str:
    """Self-contained HTML rendering (reference libs/viz/taxonomy.py:
    same balanced layout, each node an inline box with an optional hover
    tooltip from ``hover(node)``). Returns the HTML string; optionally
    writes it to ``filename``. No IPython/display dependency — callers in
    notebooks can ``IPython.display.HTML(tree_html(t))`` themselves."""
    name = name or str
    start = tree.root if start is None else start
    sizes: dict = {}
    _subtree_sizes(tree, start, sizes)

    def decorate(node) -> str:
        label = _html.escape(name(node))
        tip = hover(node) if hover is not None else ""
        if tip:
            return (
                f"<span class='box hovered'>{label}"
                f"<span class='tip'>{_html.escape(str(tip))}</span></span>"
            )
        return f"<span class='box'>{label}</span>"

    lines: list[str] = []
    # indent widths count VISIBLE characters (via the name function) while
    # `decorate` emits the markup; layout spaces are non-breaking (U+00A0)
    # so the monospace columns survive HTML whitespace collapsing.
    _render(tree, start, name, "", "updown", max_depth, halt, lines, sizes,
            " ", "│", decorate)
    # the root's start shape (_START["updown"]) is a regular space; HTML
    # whitespace collapsing would trim it and shift the root one column
    # left of its children's connector column — substitute U+00A0
    lines = [" " + ln[1:] if ln.startswith(" ") else ln for ln in lines]
    body = "\n".join(f"<div class='line'>{ln}</div>" for ln in lines)
    out = f"{_TREE_CSS}\n<div class='sparktax-tree'>\n{body}\n</div>"
    if filename is not None:
        with open(filename, "w", encoding="utf8") as f:
            f.write(out)
    return out


# ------------------------------------------------------------------- DOT


def tree_dot(
    tree: Tree,
    name: Callable | None = None,
    extra: Callable | None = None,
) -> str:
    """Graphviz DOT export of the taxonomy (the portable stand-in for the
    reference's plotly dendrogram, libs/viz/tree.py). ``extra(node)`` may
    return a dict of node attributes (e.g. ``{"color": ...}``)."""
    name = name or str
    esc = lambda s: str(s).replace('"', '\\"')  # noqa: E731
    lines = ["digraph taxonomy {", "  rankdir=LR;", "  node [shape=box];"]
    for node in sorted(tree.parent, key=str):
        attrs = {"label": name(node)}
        if extra is not None:
            attrs.update(extra(node) or {})
        a = ", ".join(f'{k}="{esc(v)}"' for k, v in attrs.items())
        lines.append(f'  "{esc(node)}" [{a}];')
    for child, parent in sorted(tree.to_edges(), key=lambda e: (str(e[1]), str(e[0]))):
        lines.append(f'  "{esc(parent)}" -> "{esc(child)}";')
    lines.append("}")
    return "\n".join(lines)


# ------------------------------------------------------- coordinate layout


def tree_coords(
    tree: Tree,
    start=None,
    step_x: float = 1.0,
    step_y: float = -0.2,
    max_depth: int | None = None,
    max_width: int | None = None,
) -> tuple[dict, list]:
    """Dendrogram coordinate layout — the reference's ``get_coords``
    algorithm (libs/viz/nary_tree.py:30-67) emitted as plain data so any
    frontend (matplotlib, plotly, the HTML report, :func:`tree_svg`) can
    draw the tree without a plotting dependency in this container.

    Each node at depth ``d`` owns a horizontal slot of width
    ``step_x / 2**d``; a leaf sits at the center of its slot, an internal
    node at the center of its children's combined span. Returns
    ``({node: (x, y)}, edges)`` where each edge is the matplotlib-style
    pair ``((x_parent, x_child), (y_parent, y_child))``.
    """
    start = tree.root if start is None else start
    lim = float("inf") if max_depth is None else max_depth
    coords: dict = {}
    edges: list = []

    def rec(node, depth: float, offset: float):
        dx = step_x / 2**depth
        y = depth * step_y
        kids = tree.children.get(node, [])[:max_width]
        if not kids or depth >= lim:
            mi, ma = offset, offset + dx
            x = offset + dx / 2
        else:
            mi = offset
            ma = offset
            child_coords = []
            for child in kids:
                xc, yc, ma = rec(child, depth + 1, ma)
                child_coords.append((xc, yc))
            x = (ma + mi) / 2
            edges.extend(((x, xb), (y, yb)) for xb, yb in child_coords)
        coords[node] = (x, y)
        return x, y, ma

    rec(start, float(tree.depth(start)), 0.0)
    return coords, edges


def plot_tree(
    coords: dict,
    edges: list,
    labels=None,
    filename: str | None = None,
    edge_params: dict | None = None,
    node_params: dict | None = None,
    label_params: dict | None = None,
    figure_params: dict | None = None,
    show: bool = True,
):
    """Matplotlib convenience wrapper over :func:`tree_coords` output —
    the reference's ``plot_tree`` surface (libs/viz/nary_tree.py:69-105):
    scatter the nodes, draw the edges, optionally annotate and save.

    matplotlib is imported LAZILY: this container doesn't ship it, so the
    function raises a clear ImportError here while working unchanged on
    any cluster with matplotlib installed (:func:`tree_svg` /
    :func:`tree_html` are the no-dependency fallbacks).

    ``labels``: None (no labels), a callable node→str, or a mapping
    node→str (missing nodes fall back to ``str``).
    """
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise ImportError(
            "plot_tree needs matplotlib, which this environment does not "
            "provide; use tree_svg()/tree_html()/tree_dot() for "
            "dependency-free rendering, or pip install matplotlib"
        ) from e
    edge_params = dict(c="k", alpha=0.2) if edge_params is None else edge_params
    node_params = dict(c="k", alpha=0.2) if node_params is None else node_params
    label_params = {} if label_params is None else label_params
    fig = plt.figure(**(figure_params or {}))
    xs = [x for x, _ in coords.values()]
    ys = [y for _, y in coords.values()]
    plt.scatter(xs, ys, **node_params)
    for edge in edges:
        plt.plot(*edge, **edge_params)
    if labels is not None:
        if callable(labels):
            name = labels
        else:
            name = lambda n: str(labels.get(n, n))  # noqa: E731
        for node, (x, y) in coords.items():
            plt.annotate(name(node), (x, y), **label_params)
    plt.axis("off")
    if filename is not None:
        plt.savefig(fname=filename)
    if show:
        plt.show()
    return fig


def tree_svg(
    tree: Tree,
    name: Callable | None = None,
    width: int = 800,
    height: int | None = None,
    filename: str | None = None,
    **layout_kwargs,
) -> str:
    """Standalone SVG dendrogram built on :func:`tree_coords` (the
    container has no matplotlib; reference plot_tree →
    libs/viz/nary_tree.py:70-105). Returns the SVG string."""
    name = name or str
    coords, edges = tree_coords(tree, **layout_kwargs)
    xs = [x for x, _ in coords.values()]
    ys = [y for _, y in coords.values()]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    depth_span = max(1, round(abs(y1 - y0) / 0.2))
    if height is None:
        height = 80 * (depth_span + 1)
    pad = 40
    sx = (width - 2 * pad) / (x1 - x0 or 1.0)
    # root (max y) at the TOP pixel row, leaves below — matches the
    # reference plot_tree orientation (libs/viz/nary_tree.py:70-105)
    sy = (height - 2 * pad) / (y1 - y0 or 1.0)

    def px(x: float) -> float:
        return round(pad + (x - x0) * sx, 2)

    def py(y: float) -> float:
        return round(pad + (y1 - y) * sy, 2)

    parts = [
        f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' "
        f"height='{height}' font-family='monospace' font-size='12'>"
    ]
    for (xa, xb), (ya, yb) in edges:
        parts.append(
            f"<line x1='{px(xa)}' y1='{py(ya)}' x2='{px(xb)}' y2='{py(yb)}' "
            "stroke='#888' stroke-opacity='0.5'/>"
        )
    for node, (x, y) in coords.items():
        label = _html.escape(str(name(node)))
        parts.append(f"<circle cx='{px(x)}' cy='{py(y)}' r='3' fill='#333'/>")
        parts.append(
            f"<text x='{px(x) + 5}' y='{py(y) - 5}'>{label}</text>"
        )
    parts.append("</svg>")
    out = "\n".join(parts)
    if filename is not None:
        with open(filename, "w", encoding="utf8") as f:
            f.write(out)
    return out
