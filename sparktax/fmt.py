"""Display formatting (reference libs/utils/format.py) — O51.

``millify`` is a Catalyst expression (usable inside selects over billions
of rows, e.g. labeling class sizes in a report table), matched
value-for-value against the reference's Python formula including its
banker's rounding ('{:.1f}' → bround, not round).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_PREFIXES = ["", "K", "M", "B", "T"]


def millify(col):
    """Column expr: 10400 → '10K', 12_500_000 → '12.5M' (reference
    millify, libs/utils/format.py:7-12: one decimal from M upward, none
    below; clamped to the T prefix)."""
    n = col.cast("double")
    i = (
        F.when(n == 0, F.lit(0))
        .otherwise(F.floor(F.log10(F.abs(n)) / 3))
    )
    i = F.greatest(F.lit(0), F.least(F.lit(4), i.cast("int")))
    scaled = n / F.pow(F.lit(10.0), (i * 3).cast("double"))
    # Python '{:.Nf}' rounds half-even → bround, then plain %f print
    with_dec = F.format_string("%.1f", F.bround(scaled, 1))
    no_dec = F.format_string("%.0f", F.bround(scaled, 0))
    suffix = F.element_at(F.array(*[F.lit(p) for p in _PREFIXES]), i + 1)
    return F.concat(F.when(i > 1, with_dec).otherwise(no_dec), suffix)


def reference_millify(n: float) -> str:
    """The reference's exact Python formula (format.py:7-12) — the parity
    target for tests."""
    import math

    i = max(
        0,
        min(
            len(_PREFIXES) - 1,
            int(math.floor(0 if n == 0 else math.log10(abs(n)) / 3)),
        ),
    )
    prec = 1 if i > 1 else 0
    return "{:.{prec}f}{}".format(n / 10 ** (3 * i), _PREFIXES[i], prec=prec)


def shorten_path(path: str, max_len: int = 40) -> str:
    """Collapse long paths for logs: keep head + tail segments."""
    if len(path) <= max_len:
        return path
    parts = path.split("/")
    if len(parts) <= 2:
        return path
    return f"{parts[0]}/…/{parts[-1]}"
