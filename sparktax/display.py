"""Notebook-style result tables without a hard IPython dependency
(reference libs/utils/display.py:15-71: ``wrap`` / ``display_table`` /
``to_html``).

Everything here returns strings; :func:`display_table` prints an aligned
ASCII table on a terminal and rich HTML when IPython is importable —
the reference hard-requires IPython (its own TODO at display.py:1),
this module is the "make it work when IPython is not available" half.
"""

from __future__ import annotations

import html as _html
from collections.abc import Iterable


def _fmt_cell(x) -> str:
    if isinstance(x, float):
        return f"{x:.2f}"
    return str(x)


def wrap(tag: str, *args, func=str, **kwargs) -> str:
    """``wrap('li', 'a', 'b') == '<li>ab</li>'`` — apply ``func`` to each
    arg, join, wrap in ``tag`` (reference wrap, display.py:22-43)."""
    body = "".join(func(a, **kwargs) for a in args)
    return f"<{tag}>{body}</{tag}>"


def _html_row(line: Iterable, length: int, header: bool = False) -> str:
    cells = [_fmt_cell(x) for x in line]
    cells += [""] * (length - len(cells))
    tag = "th" if header else "td"
    return wrap("tr", *cells, func=lambda c: wrap(tag, _html.escape(c)))


def to_html(lines: list[Iterable], cols: Iterable | None = None) -> str:
    """HTML ``<table>`` from rows (+ optional header), ragged rows padded
    to the widest (reference to_html, display.py:65-71)."""
    lines = [list(ln) for ln in lines]
    n = max((len(ln) for ln in lines), default=0)
    parts = []
    if cols is not None:
        cols = list(cols)
        n = max(n, len(cols))
        parts.append(_html_row(cols, n, header=True))
    parts.extend(_html_row(ln, n) for ln in lines)
    return wrap("table", *parts, func=str)


def to_text(lines: list[Iterable], cols: Iterable | None = None) -> str:
    """Aligned monospace table (the terminal fallback the reference lacks)."""
    lines = [[_fmt_cell(x) for x in ln] for ln in lines]
    header = [str(c) for c in cols] if cols is not None else None
    n = max(
        [len(ln) for ln in lines] + ([len(header)] if header else []), default=0
    )
    rows = ([header] if header else []) + lines
    rows = [ln + [""] * (n - len(ln)) for ln in rows]
    widths = [max(len(r[i]) for r in rows) for i in range(n)] if n else []
    out = []
    for i, r in enumerate(rows):
        out.append("  ".join(c.ljust(w) for c, w in zip(r, widths)).rstrip())
        if header and i == 0:
            out.append("  ".join("-" * w for w in widths))
    return "\n".join(out)


def display_table(lines: list[Iterable], cols: Iterable | None = None) -> None:
    """Show a table: rich HTML inside IPython, aligned text otherwise
    (reference display_table, display.py:56-62)."""
    try:
        from IPython.display import HTML, display  # type: ignore

        display(HTML(to_html(lines, cols)))
    except ImportError:
        print(to_text(lines, cols))
