"""Tree pretty-print / HTML / DOT rendering + display tables
(reference libs/tree/pprint.py, libs/viz/taxonomy.py,
libs/utils/display.py). Pure driver-side — no Spark session needed."""


import pytest

from sparktax.display import display_table, to_html, to_text, wrap
from sparktax.results import ResultDict
from sparktax.tree import Tree
from sparktax.viz import render_tree, tree_dot, tree_html


def toy_tree() -> Tree:
    return Tree.from_edges(
        [("mammal", "animal"), ("bird", "animal"),
         ("dog", "mammal"), ("cat", "mammal")]
    )


def test_render_tree_snapshot():
    """Balanced up/down layout: small subtrees above, large below, root
    mid-height — the reference print_tree shape (libs/tree/pprint.py)."""
    want = "\n".join(
        [
            "       ┌bird",
            " animal┤",
            "       │      ┌cat",
            "       └mammal┤",
            "              └dog",
        ]
    )
    assert toy_tree().render() == want
    assert render_tree(toy_tree()) == want


def test_render_tree_every_node_once_and_connected():
    t = Tree.from_edges(
        [(f"n{i}", f"n{i // 3}") for i in range(1, 40)]
    )
    out = render_tree(t)
    lines = out.splitlines()
    assert len(lines) == 40  # one line per node
    for i in range(40):
        assert sum(ln.count(f"n{i}") for ln in lines) >= 1
    # every non-root line carries exactly one start connector
    starts = sum(ln.count("┌") + ln.count("└") + ln.count("├") for ln in lines)
    assert starts == 39


def test_render_max_depth_and_halt():
    t = toy_tree()
    clipped = t.render(max_depth=1)
    assert "dog" not in clipped and "cat" not in clipped
    assert "mammal" in clipped and "bird" in clipped
    halted = t.render(halt=lambda n: n == "mammal")
    assert halted == clipped
    # start= renders a subtree only
    sub = t.render(start="mammal")
    assert "animal" not in sub and "dog" in sub and "cat" in sub


def test_render_custom_name():
    t = toy_tree()
    out = t.render(name=lambda n: n.upper())
    assert "MAMMAL" in out and "mammal" not in out


def test_tree_html(tmp_path):
    t = toy_tree()
    html = t.html(hover=lambda n: f"size of {n}", filename=str(tmp_path / "t.html"))
    assert html.count("class='box hovered'") == 5
    assert "size of mammal" in html
    assert "<style>" in html and "class='line'" in html
    assert (tmp_path / "t.html").read_text(encoding="utf8") == html
    # layout spaces must be non-breaking so columns survive HTML rendering
    assert "\xa0" in html
    # markup-free variant + escaping
    t2 = Tree.from_edges([("<b>", "root")])
    h2 = tree_html(t2)
    assert "&lt;b&gt;" in h2 and "<b>" not in h2.split("</style>")[1]
    assert t._repr_html_() == t.html()


def test_tree_dot():
    dot = tree_dot(toy_tree(), extra=lambda n: {"color": "red"} if n == "dog" else None)
    assert dot.startswith("digraph taxonomy {") and dot.endswith("}")
    assert '"animal" -> "mammal";' in dot
    assert '"mammal" -> "dog";' in dot
    assert '"dog" [label="dog", color="red"];' in dot
    assert dot.count("->") == 4


def test_display_tables(capsys):
    rows = [["a", 1.0, 2], ["bb"]]
    html = to_html(rows, cols=["x", "y", "z"])
    assert html.startswith("<table>") and html.endswith("</table>")
    assert "<th>x</th>" in html
    assert "<td>1.00</td>" in html  # reference formats floats to 2dp
    assert html.count("<td>") == 6  # ragged row padded to 3 cols
    txt = to_text(rows, cols=["x", "y", "z"])
    lines = txt.splitlines()
    assert lines[0].split() == ["x", "y", "z"]
    assert lines[2].startswith("a")
    assert wrap("h1", "Title") == "<h1>Title</h1>"
    # display_table prints the text form outside IPython... or renders HTML
    # inside it; either way it must not raise.
    display_table(rows, cols=["x", "y", "z"])
    assert capsys.readouterr()  # no exception is the contract


def test_resultdict_display():
    rd = ResultDict.from_records(
        [
            {"axiom": "C:1", "cov": 0.5, "spe": 0.25, "sco": 0.4, "step": 0},
            {"axiom": "E:2.C:3", "cov": 1.0, "spe": 0.5, "sco": 0.8, "step": 1},
        ]
    )
    html = rd._repr_html_()
    assert "<table>" in html and "E:2.C:3" in html and "step 0" in html
    txt = rd.to_text()
    assert "step 1" in txt and "0.80" in txt


def test_tree_from_df(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"child": ["dog", "cat", "mammal"], "parent": ["mammal", "mammal", "animal"]}
        )
    )
    t = Tree.from_df(df)
    assert t.root == "animal" and set(t.leaves()) == {"dog", "cat"}
    assert "┌cat" in t.render()
    # multi-root frames need add_root, same as from_edges
    df2 = spark.createDataFrame(
        pd.DataFrame({"child": ["a", "b"], "parent": ["r1", "r2"]})
    )
    t2 = Tree.from_df(df2, add_root="TOP")
    assert t2.root == "TOP" and t2.depth("a") == 2


def _ref_example_tree():
    """The reference docstring example (libs/viz/nary_tree.py:7-13)."""
    from sparktax.tree import Tree

    t = Tree("a")
    for c in "bcd":
        t.attach(c, "a")
    for c in "efg":
        t.attach(c, "b")
    t.attach("h", "c")
    for c in "ij":
        t.attach(c, "e")
    return t


def test_tree_coords_reference_example():
    """Exact layout parity with reference get_coords
    (libs/viz/nary_tree.py:30-67) on its own docstring tree, values
    hand-traced through the reference recursion."""
    from sparktax.viz import tree_coords

    coords, edges = tree_coords(_ref_example_tree())
    expected = {
        "a": (0.75, 0.0), "b": (0.375, -0.2), "c": (0.875, -0.2),
        "d": (1.25, -0.2), "e": (0.125, -0.4), "f": (0.375, -0.4),
        "g": (0.625, -0.4), "h": (0.875, -0.4), "i": (0.0625, -0.6),
        "j": (0.1875, -0.6),
    }
    assert set(coords) == set(expected)
    for k, (x, y) in expected.items():
        assert coords[k] == pytest.approx((x, y))
    # one edge per non-root node; each parent centered on its span
    assert len(edges) == len(coords) - 1
    # max_depth clips: depth-1 nodes become leaves, nothing deeper emitted
    clipped, cedges = tree_coords(_ref_example_tree(), max_depth=1)
    assert set(clipped) == set("abcd")
    assert len(cedges) == 3


def test_tree_svg(tmp_path):
    from sparktax.viz import tree_svg

    path = tmp_path / "t.svg"
    svg = tree_svg(_ref_example_tree(), filename=str(path))
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<circle") == 10 and svg.count("<line") == 9
    assert path.read_text() == svg
    # orientation matches the reference plot_tree: root at the TOP (its
    # pixel y strictly smaller than every deeper node's)
    import re

    cys = [float(m) for m in re.findall(r"cy='([0-9.]+)'", svg)]
    from sparktax.viz import tree_coords

    coords, _ = tree_coords(_ref_example_tree())
    root_y = max(y for _, y in coords.values())  # root has max layout y
    deepest = min(y for _, y in coords.values())
    assert root_y > deepest
    assert min(cys) < max(cys)
    # root maps to the minimum pixel row
    order = sorted(coords.values(), key=lambda p: -p[1])
    assert order[0][1] == root_y
    root_py = min(cys)
    assert root_py == pytest.approx(40.0)  # pad — top of the canvas


def test_plot_tree_no_matplotlib_error():
    """In-container path: a clear ImportError naming the fallbacks."""
    from sparktax.viz import plot_tree, tree_coords

    coords, edges = tree_coords(_ref_example_tree())
    with pytest.raises(ImportError, match="tree_svg"):
        plot_tree(coords, edges)


def test_plot_tree_artist_counts_under_stub(monkeypatch):
    """With a stub matplotlib: one scatter of all nodes, one plot() per
    edge, one annotate per node when labels given, savefig on filename."""
    import sys
    import types

    calls = {"scatter": [], "plot": [], "annotate": [], "savefig": [],
             "figure": [], "axis": [], "show": []}
    plt = types.ModuleType("matplotlib.pyplot")
    for k in calls:
        def make(k=k):
            def f(*a, **kw):
                calls[k].append((a, kw))
                return object()
            return f
        setattr(plt, k, make())
    mpl = types.ModuleType("matplotlib")
    mpl.pyplot = plt
    monkeypatch.setitem(sys.modules, "matplotlib", mpl)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", plt)

    from sparktax.viz import plot_tree, tree_coords

    coords, edges = tree_coords(_ref_example_tree())
    plot_tree(coords, edges, labels={"a": "root"}, filename="/dev/null/x.png")
    assert len(calls["scatter"]) == 1
    xs, ys = calls["scatter"][0][0][:2]
    assert len(xs) == len(coords) and len(ys) == len(coords)
    assert len(calls["plot"]) == len(edges)
    assert len(calls["annotate"]) == len(coords)
    # dict labels: mapped node uses the mapping, others fall back to str
    noted = {a[0] for a, _ in calls["annotate"]}
    assert "root" in noted and "a" not in noted and "b" in noted
    assert len(calls["savefig"]) == 1 and len(calls["show"]) == 1
    assert len(calls["axis"]) == 1
    # default styling flows through to the artists
    assert calls["scatter"][0][1].get("alpha") == 0.2
    # show=False suppresses plt.show
    plot_tree(coords, edges, show=False)
    assert len(calls["show"]) == 1


def test_tree_html_root_column_nbsp():
    """The root line must not start with a plain space (HTML collapsing
    would shift the root left of its children's connector column)."""
    from sparktax.tree import Tree
    from sparktax.viz import tree_html

    t = Tree("r")
    for c in "ab":
        t.attach(c, "r")
    html = tree_html(t)
    for line in html.splitlines():
        if "class='line'" in line:
            content = line.split(">", 1)[1]
            assert not content.startswith(" ")  # plain space banned
