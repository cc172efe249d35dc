"""Axiom induction: distributed candidate mining + local beam search.

Distributed lane (Spark SQL):
  * :func:`mine_atoms` — per sampled entity, candidate atomic axioms:
    its valid types (Concept), its out-edges as ∃r.{target} singletons,
    and the 2-hop ∃r.C pattern (the classic KG self-join, O16) — reference
    ent_extraction, libs/axiom_extraction/graph_extraction.py:8-25.
  * :func:`frequent_atoms` — per-task frequency prefilter
    ``count > threshold·n`` (reference :28-39) bounding kernel matrix width.

Kernel lane (numpy, inside applyInPandas or driver):
  * :class:`LocalInducer` — the beam search of reference
    libs/axiom_extraction/inducer.py:45-120 over the local boolean matrix:
    OR-extend when coverage is low, AND-extend when specificity is low,
    score ∈ {harmonic, arithmetic}, beam of ``keep_n``, stop below
    ``min_gain``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sparktax.graph.kg import KnowledgeGraph

# ---------------------------------------------------------------- mining


def mine_atoms(
    kg: KnowledgeGraph,
    sample: DataFrame,
    individuals: bool = True,
    existential: bool = True,
    concepts: bool = True,
    salt_hot_min: int | str | None = "auto",
    salt_buckets: int = 16,
) -> DataFrame:
    """sample: (task_id, h). → (task_id, h, atom) long-form candidates.

    All three patterns are joins against the triples table. The 2-hop
    existential join is tail-skewed (hub entities: one popular target
    concentrates the probe side). ``salt_hot_min="auto"`` (the default,
    north_rule: salting beyond AQE) runs a heavy-hitter pre-pass whose
    threshold derives from the shuffle-partition target
    (:func:`sparktax.skew.auto_hot_keys`) and salts only when hot keys
    exist; an int pins the threshold; ``None`` opts out, leaving AQE's
    skew split as the only defense.

    When the graph carries co-located bucketed copies
    (:meth:`KnowledgeGraph.with_colocated`), the 2-hop join reads the
    ``t``-bucketed copy on the probe side and the ``h``-bucketed copy on
    the tail-types side — both sides arrive pre-partitioned on the join
    key and the join plans with ZERO shuffle Exchanges (the sample tag
    join is an explicit broadcast, which preserves the scan's bucketing).
    """
    ts = kg.triples_keyed_on("t").join(
        broadcast(sample.select("task_id", "h").distinct()), "h"
    )  # out-edges of sampled entities, tagged by task (sample is small →
    # broadcast, keeping the bucketed scan's output partitioning intact)
    isa = F.col("r") == kg.isa
    valid = broadcast(kg.valid_type_ids().withColumnRenamed("id", "t"))
    parts = []
    if concepts:
        parts.append(
            ts.filter(isa)
            .join(valid, "t", "left_semi")
            .select(
                "task_id", "h", F.concat(F.lit("C:"), F.col("t")).alias("atom")
            )
        )
    if existential:
        non_isa = ts.filter(~isa)
        if individuals:
            parts.append(
                non_isa.select(
                    "task_id",
                    "h",
                    F.concat(
                        F.lit("E:"), F.col("r"), F.lit(".I:"), F.col("t")
                    ).alias("atom"),
                )
            )
        tail_types = (
            kg.triples_keyed_on("h").filter(F.col("r") == kg.isa)
            .join(valid, "t", "left_semi")
            .select(F.col("h").alias("x"), F.col("t").alias("cls"))
        )
        hops = non_isa.select("task_id", "h", F.col("r"), F.col("t").alias("x"))
        if salt_hot_min is None:
            joined = hops.join(tail_types, "x")
        else:
            from sparktax.skew import auto_hot_keys, salted_join

            if salt_hot_min == "auto":
                hot = auto_hot_keys(hops, "x")
            else:
                from sparktax.skew import top_hot_keys

                hot = top_hot_keys(hops, "x", salt_hot_min)
            joined = (
                salted_join(hops, tail_types, "x", hot_keys=hot, buckets=salt_buckets)
                if hot
                else hops.join(tail_types, "x")
            )
        parts.append(
            joined
            .select(
                "task_id",
                "h",
                F.concat(
                    F.lit("E:"), F.col("r"), F.lit(".C:"), F.col("cls")
                ).alias("atom"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def frequent_atoms(
    atoms: DataFrame, sample_sizes: DataFrame, threshold: float = 0.1
) -> DataFrame:
    """Keep atoms with per-task support count > threshold·n_task.

    ``sample_sizes``: (task_id, n). Strict `>` matches the reference."""
    counts = atoms.groupBy("task_id", "atom").agg(F.count("*").alias("support"))
    return (
        counts.join(broadcast(sample_sizes), "task_id")
        .filter(F.col("support") > F.col("n") * threshold)
        .select("task_id", "atom", "support")
    )


def atom_matrix(atoms: DataFrame, frequent: DataFrame) -> DataFrame:
    """(task_id, h, atom) restricted to the frequent vocabulary — the
    long-form sparse entity–axiom matrix (reference D8) shipped into the
    induction kernel."""
    return atoms.join(frequent.select("task_id", "atom"), ["task_id", "atom"], "left_semi")


# ---------------------------------------------------------------- kernel


def _scores(
    vecs: np.ndarray, mask: np.ndarray, how: str = "harmonic"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """vecs: (k, n) bool — k candidate vectors over n entities.
    cov = |vec∧mask|/|mask|; spe = 1 − |vec∧¬mask|/|¬mask|
    (reference Axiom.evaluate, libs/axiom/base.py:115-133)."""
    m = int(mask.sum())
    neg = int((~mask).sum())
    cov = (vecs & mask).sum(axis=1) / max(m, 1)
    spe = 1.0 - (vecs & ~mask).sum(axis=1) / max(neg, 1)
    if how == "harmonic":
        denom = cov + spe
        sco = np.where(denom > 0, 2 * cov * spe / np.where(denom > 0, denom, 1), 0.0)
    elif how == "arithmetic":
        sco = (cov + spe) / 2
    else:
        raise ValueError(f"unknown score {how!r}")
    return cov, spe, sco


class LocalInducer:
    """Beam search over a local boolean atom matrix.

    ``A``: (n_entities, n_atoms) bool; ``atom_keys``: serialized atoms;
    ``mask``: True = positive example. Returns records
    (axiom_key, cov, spe, sco) best-first.

    Deviation from the reference (documented): the reference truncates
    candidate lists to ``keep_n`` BEFORE scoring order is considered
    (inducer.py:102 ``improve(...)[:keep_n]``), which silently keeps an
    arbitrary subset; we sort by score first. Set
    ``truncate_unsorted=True`` for bit-parity with that behavior.
    """

    def __init__(
        self,
        A: np.ndarray,
        atom_keys: list[str],
        mask: np.ndarray,
        score: str = "harmonic",
        truncate_unsorted: bool = False,
        filter_similar: bool = True,
    ):
        self.A = A.astype(bool)
        self.keys = list(atom_keys)
        self.mask = mask.astype(bool)
        self.score = score
        self.truncate_unsorted = truncate_unsorted
        self.filter_similar = filter_similar

    @staticmethod
    def _atom_rel(atom_key: str) -> str | None:
        """Relation of an existential atom key (``E:<rel>.…``) — None for
        concept atoms (the reference exempts rdf:type atoms)."""
        if atom_key.startswith("E:"):
            return atom_key[2:].split(".", 1)[0]
        return None

    def _filter_similar(self, cands: list[tuple]) -> list[tuple]:
        """Per-relation near-duplicate suppression (reference
        filter_similar_axioms, libs/axiom_induction/inducer.py:249-261):
        among candidates whose added atom is existential, keep only those
        tying the best score for that relation — otherwise ``E:r.C:x``
        variants of one hub relation crowd the beam."""
        best: dict[str, float] = {}
        for c in cands:
            rel = self._atom_rel(c[6])
            if rel is not None:
                best[rel] = max(best.get(rel, -1.0), c[0])
        return [
            c
            for c in cands
            if self._atom_rel(c[6]) is None or c[0] >= best[self._atom_rel(c[6])]
        ]

    def find(
        self,
        max_axioms: int = 2,
        min_gain: float = 0.08,
        keep_n: int = 8,
        threshold: float = 0.85,
        reverse: bool = False,
    ) -> list[dict]:
        mask = ~self.mask if reverse else self.mask
        n, k = self.A.shape
        if k == 0 or n == 0:
            return []
        acov, aspe, asco = _scores(self.A.T, mask, self.score)

        # beam entries: (vec, key, used_atom_indices, cov, spe, sco)
        beam = [(np.zeros(n, dtype=bool), None, frozenset(), 0.0, 0.0, 0.0)]
        best: dict[str, dict] = {}
        for step in range(max_axioms):
            cands: list[tuple] = []
            for vec, key, used, icov, ispe, isco in beam:
                ops = []
                if icov < threshold:
                    ops.append("or")
                if ispe < threshold and key is not None:
                    ops.append("and")
                if key is None:
                    ops = ["or"]  # empty axiom: only OR grows it
                ele: list[tuple] = []
                for op in ops:
                    if op == "or":
                        newv = vec[None, :] | self.A.T
                    else:
                        newv = vec[None, :] & self.A.T
                    cov, spe, sco = _scores(newv, mask, self.score)
                    gain = sco - isco
                    for j in range(k):
                        if j in used or gain[j] < min_gain:
                            continue
                        nk = self._combine(key, op, self.keys[j])
                        ele.append(
                            (
                                float(sco[j]),
                                nk,
                                newv[j],
                                used | {j},
                                float(cov[j]),
                                float(spe[j]),
                                self.keys[j],
                            )
                        )
                # reference applies the per-relation filter per improve()
                # call, i.e. per beam element's candidate list
                cands.extend(self._filter_similar(ele) if self.filter_similar else ele)
            if not cands:
                break
            if not self.truncate_unsorted:
                cands.sort(key=lambda c: -c[0])
            seen_keys = set()
            next_beam = []
            for sco, nk, vec, used, cov, spe, _atom in cands:
                if nk in seen_keys or nk in best:
                    continue
                seen_keys.add(nk)
                next_beam.append((vec, nk, used, cov, spe, sco))
                best[nk] = {
                    "axiom": nk, "cov": cov, "spe": spe, "sco": sco, "step": step,
                }
                if len(next_beam) >= keep_n:
                    break
            beam = next_beam
        return sorted(best.values(), key=lambda r: -r["sco"])

    @staticmethod
    def _combine(key: str | None, op: str, atom_key: str) -> str:
        from sparktax.axioms import parse_axiom

        if key is None:
            return atom_key
        a, b = parse_axiom(key), parse_axiom(atom_key)
        return (a | b).key() if op == "or" else (a & b).key()

    def best(self, threshold: float, **kw) -> dict | None:
        recs = self.find(threshold=threshold, **kw)
        for r in recs:
            if r["sco"] >= threshold:
                return r
        return None

    def find_results(self, **kw) -> "ResultDict":
        """:class:`sparktax.results.ResultDict` view of :meth:`find` —
        per-step ranked records with the reference's filter/rank API
        (reference ResultDict, libs/axiom_extraction/results.py:35-116)."""
        from sparktax.results import ResultDict

        return ResultDict.from_records(self.find(**kw))
