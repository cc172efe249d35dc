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
