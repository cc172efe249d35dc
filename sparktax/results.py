"""Ranked axiom results (reference AxiomRecord / ResultDict,
libs/axiom_extraction/results.py:7-116), operating on serialized axiom
keys (``C:…``, ``E:r.…``, ``AND(…)``, ``OR(…)``, ``NOT(…)``)."""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from functools import total_ordering


def is_concept(key: str) -> bool:
    """Atomic named-class axiom."""
    return key.startswith("C:")


def is_neg(key: str) -> bool:
    return key.startswith("NOT(")


def is_composed(key: str) -> bool:
    return key.startswith(("AND(", "OR(", "REM("))


@total_ordering
@dataclass
class AxiomRecord:
    axiom: str
    cov: float
    spe: float
    sco: float
    step: int = -1

    FIELDS = ("axiom", "cov", "spe", "sco", "step")

    def as_list(self) -> list:
        return [self.axiom, self.cov, self.spe, self.sco, self.step]

    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.FIELDS}

    # ordering is by score (reference: max(records) = best score)
    def __lt__(self, other) -> bool:
        if isinstance(other, AxiomRecord):
            return self.sco < other.sco
        return NotImplemented

    def __eq__(self, other) -> bool:
        if isinstance(other, AxiomRecord):
            return self.sco == other.sco
        return NotImplemented


class ResultDict(defaultdict):
    """step → [AxiomRecord], with filtered iteration and ranking.

    NOTE: the reference inverts ``AxiomRecord.__lt__`` so ``sorted()``
    is descending and then reverses it again in ``ranked`` (results.py:78)
    — net effect: ranked() is highest-score-first. We keep natural
    ordering and sort explicitly, same net behavior.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.default_factory = list

    @classmethod
    def from_records(cls, records: list[dict]) -> "ResultDict":
        rd = cls()
        for r in records:
            rec = AxiomRecord(
                r["axiom"], r["cov"], r["spe"], r["sco"], int(r.get("step", -1))
            )
            rd[rec.step].append(rec)
        return rd

    def flatten(
        self,
        exclude_concepts: bool = True,
        exclude_neg: bool = False,
        exclude_pos: bool = False,
        exclude_composed: bool = False,
        exclude_custom=None,
    ):
        def valid(rec: AxiomRecord) -> bool:
            k = rec.axiom
            return not (
                (exclude_concepts and is_concept(k))
                or (exclude_neg and is_neg(k))
                or (exclude_pos and not is_neg(k))
                or (exclude_composed and is_composed(k))
                or (exclude_custom is not None and exclude_custom(k))
            )

        return [rec for recs in self.values() for rec in recs if valid(rec)]

    def iter_records(self):
        for rec in self.flatten():
            yield rec.as_dict()

    def iter_axioms(self):
        for rec in self.flatten():
            yield rec.axiom

    def ranked(self, **filters) -> list[AxiomRecord]:
        """Records ranked highest-score first."""
        return sorted(self.flatten(**filters), key=lambda r: -r.sco)

    def best(self, **filters) -> AxiomRecord | None:
        recs = self.flatten(**filters)
        return max(recs) if recs else None

    def n_best(self, n: int | None = None, **filters) -> list[AxiomRecord]:
        recs = self.ranked(**filters)
        return recs if n is None or n > len(recs) else recs[:n]

    # ------------------------------------------------------------ display
    def table_rows(self) -> list[list]:
        """Step-grouped rows (a ``step N`` banner row, then that step's
        records) — the layout of the reference's ``_ipython_display_``
        (results.py:40-46)."""
        rows: list[list] = []
        for step in sorted(self):
            rows.append([f"step {step}"])
            for rec in self[step]:
                rows.append([rec.axiom, rec.cov, rec.spe, rec.sco])
        return rows

    def _repr_html_(self) -> str:
        from sparktax.display import to_html

        return to_html(self.table_rows(), cols=["axiom", "cov", "spe", "sco"])

    def to_text(self) -> str:
        from sparktax.display import to_text

        return to_text(self.table_rows(), cols=["axiom", "cov", "spe", "sco"])

    def show(self) -> None:
        """Terminal/notebook display (reference ``_ipython_display_``)."""
        from sparktax.display import display_table

        display_table(self.table_rows(), cols=["axiom", "cov", "spe", "sco"])

    def pos_only(self, **filters) -> "ResultDict":
        filters["exclude_neg"] = True
        filters["exclude_pos"] = False
        out = ResultDict()
        for rec in self.flatten(**filters):
            out[rec.step].append(rec)
        return out

    def neg_only(self, **filters) -> "ResultDict":
        filters["exclude_neg"] = False
        filters["exclude_pos"] = True
        out = ResultDict()
        for rec in self.flatten(**filters):
            out[rec.step].append(rec)
        return out
