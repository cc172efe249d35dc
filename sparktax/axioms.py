"""DL-style axiom algebra (reference libs/axiom/: base.py, atomic.py,
operators.py) with two coupled semantics:

* **vector semantics** — boolean numpy columns over a sampled entity set,
  used inside the induction kernel (reference ``Axiom.vec``); handled by
  :class:`sparktax.induction.LocalInducer` (atoms are columns, operators
  are ``&``/``|``/``~`` on arrays).
* **set semantics** — the *extension* of an axiom as a DataFrame of entity
  ids, used for sampling at graph scale (reference ``sfunc``,
  libs/axiom/operators.py:63-80): And → semi-join chain, Or → union,
  Neg/Remainder → anti-join.

Axioms serialize to/from compact strings (``C:12``, ``E:3.C:7``,
``E:3.I:99``, ``E:3.T``, ``AND(...)``, ``OR(...)``, ``NOT(...)``,
``REM(base|sub1,sub2)``) so they can cross the Spark↔driver boundary as
plain columns.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Axiom:
    def key(self) -> str:
        raise NotImplementedError

    def extension(self, kg) -> DataFrame:
        """DataFrame with one column ``h`` — entities satisfying the axiom."""
        raise NotImplementedError

    def name(self, kg=None) -> str:
        return self.key()

    # algebra sugar
    def __and__(self, other: "Axiom") -> "Axiom":
        return And(_flatten(And, self, other))

    def __or__(self, other: "Axiom") -> "Axiom":
        return Or(_flatten(Or, self, other))

    def __invert__(self) -> "Axiom":
        return self.child if isinstance(self, Neg) else Neg(self)

    def __eq__(self, other) -> bool:
        return isinstance(other, Axiom) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())

    def __repr__(self) -> str:
        return self.key()


def _flatten(kind, a: Axiom, b: Axiom) -> tuple:
    parts: list[Axiom] = []
    for x in (a, b):
        if isinstance(x, kind):
            parts.extend(x.children)
        elif isinstance(x, Top) and kind is And:
            continue
        else:
            parts.append(x)
    # canonical order → structural equality of commutative expressions
    return tuple(sorted(set(parts), key=lambda x: x.key()))


@dataclass(frozen=True, eq=False)
class Top(Axiom):
    """⊤ — every entity (reference TopAxiom)."""

    def key(self) -> str:
        return "T"

    def extension(self, kg) -> DataFrame:
        return kg.entities.select(F.col("id").alias("h"))


@dataclass(frozen=True, eq=False)
class Concept(Axiom):
    """Named class C: {h | (h, isa, C)}."""

    cls: int

    def key(self) -> str:
        return f"C:{self.cls}"

    def extension(self, kg) -> DataFrame:
        return kg.instances_of_type(self.cls)

    def name(self, kg=None) -> str:
        return _ename(kg, self.cls)


@dataclass(frozen=True, eq=False)
class Existential(Axiom):
    """∃R.C — heads of R whose tail is in C; C may be a Concept, a
    Singleton target entity (``tgt``), or None = ⊤ (reference Existential,
    libs/axiom/atomic.py:63-128)."""

    rel: int
    cls: int | None = None
    tgt: int | None = None

    def key(self) -> str:
        if self.tgt is not None:
            return f"E:{self.rel}.I:{self.tgt}"
        if self.cls is not None:
            return f"E:{self.rel}.C:{self.cls}"
        return f"E:{self.rel}.T"

    def extension(self, kg) -> DataFrame:
        edges = kg.triples_keyed_on("h").filter(F.col("r") == self.rel)
        if self.tgt is not None:
            return edges.filter(F.col("t") == self.tgt).select("h").distinct()
        if self.cls is None:
            return edges.select("h").distinct()
        return kg.instances_of_existential(self.rel, self.cls)

    def name(self, kg=None) -> str:
        rel = _rname(kg, self.rel)
        if self.tgt is not None:
            return f"∃{rel}.{{{_ename(kg, self.tgt)}}}"
        if self.cls is None:
            return f"∃{rel}.⊤"
        return f"∃{rel}.{_ename(kg, self.cls)}"


@dataclass(frozen=True, eq=False)
class And(Axiom):
    children: tuple

    def key(self) -> str:
        return "AND(" + ",".join(c.key() for c in self.children) + ")"

    def extension(self, kg) -> DataFrame:
        exts = [c.extension(kg) for c in self.children]
        return reduce(lambda a, b: a.join(b, "h", "left_semi"), exts).distinct()

    def name(self, kg=None) -> str:
        return " ⊓ ".join(c.name(kg) for c in self.children)


@dataclass(frozen=True, eq=False)
class Or(Axiom):
    children: tuple

    def key(self) -> str:
        return "OR(" + ",".join(c.key() for c in self.children) + ")"

    def extension(self, kg) -> DataFrame:
        exts = [c.extension(kg) for c in self.children]
        return reduce(lambda a, b: a.union(b), exts).distinct()

    def name(self, kg=None) -> str:
        return "(" + " ⊔ ".join(c.name(kg) for c in self.children) + ")"


@dataclass(frozen=True, eq=False)
class Neg(Axiom):
    child: Axiom

    def key(self) -> str:
        return f"NOT({self.child.key()})"

    def extension(self, kg) -> DataFrame:
        return (
            kg.entities.select(F.col("id").alias("h"))
            .join(self.child.extension(kg), "h", "left_anti")
        )

    def name(self, kg=None) -> str:
        return f"¬{self.child.name(kg)}"


@dataclass(frozen=True, eq=False)
class Remainder(Axiom):
    """*A = A ∖ ⋃ subtracted — the unlabeled rest of a parent cluster
    (reference RemainderAxiom, libs/axiom/base.py:212-245)."""

    base: Axiom
    subtracted: tuple = ()

    def key(self) -> str:
        subs = ",".join(s.key() for s in self.subtracted)
        return f"REM({self.base.key()}|{subs})"

    def extension(self, kg) -> DataFrame:
        ext = self.base.extension(kg)
        for s in self.subtracted:
            ext = ext.join(s.extension(kg), "h", "left_anti")
        return ext.distinct()

    def name(self, kg=None) -> str:
        return f"*{self.base.name(kg)}"


def _ename(kg, eid: int) -> str:
    if kg is None:
        return str(eid)
    row = kg.entities.filter(F.col("id") == eid).select("uri").first()
    return row[0] if row else str(eid)


def _rname(kg, rid: int) -> str:
    if kg is None:
        return str(rid)
    row = kg.relations.filter(F.col("id") == rid).select("uri").first()
    return row[0] if row else str(rid)


# ------------------------------------------------------------------ parsing
def parse_axiom(key: str) -> Axiom:
    """Inverse of ``Axiom.key()``."""
    s = key.strip()

    def parse(s: str) -> tuple[Axiom, str]:
        if s.startswith("T") and (len(s) == 1 or s[1] in ",)|"):
            return Top(), s[1:]
        if s.startswith("C:"):
            i = _scan(s, 2)
            return Concept(int(s[2:i])), s[i:]
        if s.startswith("E:"):
            i = _scan(s, 2)
            rel = int(s[2:i])
            rest = s[i:]
            if not rest.startswith("."):
                raise ValueError(f"bad existential: {s!r}")
            rest = rest[1:]
            if rest.startswith("C:"):
                i = _scan(rest, 2)
                return Existential(rel, cls=int(rest[2:i])), rest[i:]
            if rest.startswith("I:"):
                i = _scan(rest, 2)
                return Existential(rel, tgt=int(rest[2:i])), rest[i:]
            if rest.startswith("T"):
                return Existential(rel), rest[1:]
            raise ValueError(f"bad existential: {s!r}")
        for tag, kind in (("AND(", And), ("OR(", Or)):
            if s.startswith(tag):
                rest = s[len(tag):]
                children = []
                while True:
                    child, rest = parse(rest)
                    children.append(child)
                    if rest.startswith(","):
                        rest = rest[1:]
                        continue
                    if rest.startswith(")"):
                        return kind(tuple(children)), rest[1:]
                    raise ValueError(f"bad {tag} in {s!r}")
        if s.startswith("NOT("):
            child, rest = parse(s[4:])
            if not rest.startswith(")"):
                raise ValueError(f"bad NOT in {s!r}")
            return Neg(child), rest[1:]
        if s.startswith("REM("):
            base, rest = parse(s[4:])
            if not rest.startswith("|"):
                raise ValueError(f"bad REM in {s!r}")
            rest = rest[1:]
            subs = []
            while not rest.startswith(")"):
                sub, rest = parse(rest)
                subs.append(sub)
                if rest.startswith(","):
                    rest = rest[1:]
            return Remainder(base, tuple(subs)), rest[1:]
        raise ValueError(f"unparseable axiom {key!r} at {s!r}")

    def _scan(s: str, start: int) -> int:
        i = start
        while i < len(s) and (s[i].isdigit() or s[i] == "-"):
            i += 1
        return i

    ax, rest = parse(s)
    if rest:
        raise ValueError(f"trailing data in {key!r}: {rest!r}")
    return ax
