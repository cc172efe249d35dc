"""Deterministic synthetic data generators (seed-stable, numpy-only).

Everything downstream tests/benches against these (SURVEY.md §7 step 1):

* ``gen_transcripts_pdf`` — multi-turn agent transcripts whose turns embed
  plantable ``"<Subj> <pred> <Obj>."`` statements from a seeded vocabulary,
  so gold triples are known exactly. Supports a skew mode (a few hot
  conv_ids) to exercise salting/AQE.
* ``gen_kg_pdf`` — a micro knowledge graph mirroring the semantics of the
  reference's data/demo.txt + data/graph/toy (isa triples, 2-hop patterns,
  hub entities, invalid-type names, lightweight-excluded relations).
* ``gen_blob_embeddings_pdf`` — blob-per-class embeddings exactly in the
  scheme of reference libs/cluster/examples.py:7-9 (per-class centroid +
  seeded noise, centroids nested hierarchically so soft-mapping has signal).

All generators are pure pandas/numpy; ``to_spark`` helpers attach schemas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparktax import schemas

# --------------------------------------------------------------------------
# Vocabulary
# --------------------------------------------------------------------------

# Filler words: lowercase, underscore-free → can never match the predicate
# grammar (see sparktax.extract.rules.STATEMENT_RE).
_FILLER = (
    "the a so then well ok query result tool ran output checked looking "
    "found note see run step next first also maybe sure here now data value"
).split()

# Predicates: lowercase with ≥1 underscore. `is_a` is the isa/type relation.
PREDICATES = (
    "is_a works_at located_in born_in founded_by acquired_by part_of "
    "capital_of reports_to married_to member_of subsidiary_of"
).split()
ISA = "is_a"

# Entity surname/name pools — combined into canonical entity names
# (capitalized, underscore-joined → match the subject/object grammar).
_GIVEN = (
    "Ada Alan Grace Edsger Barbara Donald John Tim Margaret Radia "
    "Linus Guido Bjarne Dennis Ken Leslie Frances Katherine Annie Mary"
).split()
_FAMILY = (
    "Lovelace Turing Hopper Dijkstra Liskov Knuth McCarthy Lee Hamilton "
    "Perlman Torvalds Rossum Stroustrup Ritchie Thompson Lamport Allen "
    "Johnson Easley Jackson"
).split()
_ORGS = (
    "Acme_Corp Globex Initech Umbrella_Labs Stark_Industries Wayne_Enterprises "
    "Hooli Pied_Piper Aperture_Science Tyrell_Corp Cyberdyne Wonka_Industries"
).split()
_PLACES = (
    "Montreal Paris London Tokyo Berlin Zurich Oslo Lisbon Prague Vienna "
    "Kyoto Geneva Turin Quebec Boston Austin"
).split()
# class tree used for is_a statements: child -> parent
CLASS_TREE = {
    "Person": "Agent",
    "Organisation": "Agent",
    "Scientist": "Person",
    "Engineer": "Person",
    "Company": "Organisation",
    "University": "Organisation",
    "Place": "Thing",
    "City": "Place",
    "Agent": "Thing",
}
CLASSES = sorted(set(CLASS_TREE) | set(CLASS_TREE.values()))

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "search", "kg_lookup", "calculator", ""]


def entity_vocab() -> list[str]:
    """Canonical entity names (deterministic order)."""
    people = [f"{g}_{f}" for g, f in zip(_GIVEN, _FAMILY)]
    return people + _ORGS + _PLACES


def entity_class_det(name: str, rng: np.random.RandomState) -> str:
    if name in _ORGS:
        return "Company"
    if name in _PLACES:
        return "City"
    return "Scientist" if rng.rand() < 0.5 else "Engineer"


# --------------------------------------------------------------------------
# Transcripts
# --------------------------------------------------------------------------


def gen_transcripts_pdf(
    n_convs: int = 200,
    min_turns: int = 5,
    max_turns: int = 40,
    seed: int = 42,
    skew: bool = False,
    statements_per_turn: float = 0.9,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, gold_triples) pandas frames.

    transcripts: (conv_id, turn_idx, role, text, tool, ts)
    gold_triples: (conv_id, turn_idx, subj, pred, obj)

    Statements are planted verbatim as ``"Subj pred Obj."`` tokens inside
    filler text; the rule-based extractor must recover exactly these (the
    per-turn text-equality invariant).
    """
    rng = np.random.RandomState(seed)
    ents = entity_vocab()
    ent_cls = {e: entity_class_det(e, rng) for e in ents}
    rows, gold = [], []
    base_ts = np.datetime64("2025-06-01T00:00:00")

    # skew mode: first 3 conversations get ~20x the typical turn count
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        if skew and c < 3:
            n_turns = int(max_turns * 20)
        else:
            n_turns = int(rng.randint(min_turns, max_turns + 1))
        ts = base_ts + np.timedelta64(int(rng.randint(0, 10_000_000)), "s")
        for t in range(n_turns):
            role = ROLES[int(rng.randint(0, len(ROLES)))]
            tool = TOOLS[int(rng.randint(0, len(TOOLS)))] if role == "tool" else ""
            words = [
                _FILLER[int(i)] for i in rng.randint(0, len(_FILLER), rng.randint(3, 12))
            ]
            # plant 0..3 statements at random positions
            n_stmt = int(rng.poisson(statements_per_turn))
            for _ in range(min(n_stmt, 3)):
                if rng.rand() < 0.25:
                    subj = ents[int(rng.randint(0, len(ents)))]
                    pred, obj = ISA, ent_cls[subj]
                else:
                    subj = ents[int(rng.randint(0, len(ents)))]
                    pred = PREDICATES[1 + int(rng.randint(0, len(PREDICATES) - 1))]
                    obj = ents[int(rng.randint(0, len(ents)))]
                    if obj == subj:
                        obj = ents[(ents.index(subj) + 1) % len(ents)]
                stmt = f"{subj} {pred} {obj}."
                pos = int(rng.randint(0, len(words) + 1))
                words.insert(pos, stmt)
                gold.append((conv_id, t, subj, pred, obj))
            ts = ts + np.timedelta64(int(rng.randint(1, 120)), "s")
            rows.append((conv_id, t, role, " ".join(words), tool, pd.Timestamp(ts)))

    transcripts = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})
    gold_df = pd.DataFrame(
        gold, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
    ).astype({"turn_idx": "int32"})
    return transcripts, gold_df


def transcripts_to_spark(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)


# --------------------------------------------------------------------------
# Micro knowledge graph (demo.txt-style semantics)
# --------------------------------------------------------------------------


def gen_kg_pdf(
    n_entities: int = 1500,
    n_triples: int = 5000,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Return (triples, entities, relations) pandas frames (F2 fixture).

    Includes: isa triples (rdf:type), 2-hop entity→entity→type patterns for
    ∃R.C mining, hub entities for skew, invalid-type names (yago:/Wikidata)
    and lightweight-excluded relations (rdfs:label, foaf:name,
    dcterms:description) — per reference libs/graph/knowledge_graph.py:160-186.
    """
    rng = np.random.RandomState(seed)
    rel_uris = (
        ["rdf:type", "rdfs:label", "foaf:name", "dcterms:description"]
        + [f"dbo:{p}" for p in PREDICATES[1:]]
        + [f"dbo:rel{i}" for i in range(25)]
    )
    relations = pd.DataFrame({"id": np.arange(len(rel_uris), dtype=np.int64), "uri": rel_uris})

    class_uris = [f"dbo:{c}" for c in CLASSES]
    bad_classes = ["yago:Alien", "dbo:Stuff:WikidataThing"]
    sentinels = ["<STRING>", "<LABEL:en>", "xsd:date"]
    n_plain = n_entities - len(class_uris) - len(bad_classes) - len(sentinels)
    ent_uris = (
        class_uris
        + bad_classes
        + sentinels
        + [f"dbr:Entity_{i:05d}" for i in range(n_plain)]
    )
    entities = pd.DataFrame({"id": np.arange(len(ent_uris), dtype=np.int64), "uri": ent_uris})

    isa = 0  # rdf:type id
    class_ids = np.arange(len(class_uris), dtype=np.int64)
    plain_lo = len(class_uris) + len(bad_classes) + len(sentinels)
    plain_ids = np.arange(plain_lo, len(ent_uris), dtype=np.int64)

    hs, rs, ts = [], [], []
    # every plain entity gets ≥1 type (isa triple)
    ent_type = rng.choice(class_ids, size=plain_ids.size)
    hs += list(plain_ids)
    rs += [isa] * plain_ids.size
    ts += list(ent_type)
    # hub entities: first 5 plain entities appear as tail of many triples
    hubs = plain_ids[:5]
    n_rel = len(rel_uris)
    remaining = n_triples - plain_ids.size
    h_arr = rng.choice(plain_ids, size=remaining)
    r_arr = rng.randint(4, n_rel, size=remaining).astype(np.int64)
    t_arr = np.where(
        rng.rand(remaining) < 0.15,
        rng.choice(hubs, size=remaining),
        rng.choice(plain_ids, size=remaining),
    )
    hs += list(h_arr)
    rs += list(r_arr)
    ts += list(t_arr)
    triples = pd.DataFrame(
        {
            "h": np.asarray(hs, dtype=np.int64),
            "r": np.asarray(rs, dtype=np.int64),
            "t": np.asarray(ts, dtype=np.int64),
        }
    ).drop_duplicates(ignore_index=True)
    return triples, entities, relations


# --------------------------------------------------------------------------
# Blob embeddings (F4): HAC must recover the planted taxonomy exactly
# --------------------------------------------------------------------------


def gen_blob_embeddings_pdf(
    tree: dict[str, str] | None = None,
    per_class: int = 40,
    dim: int = 8,
    seed: int = 42,
    spread: float = 2.0,
    noise: float = 0.04,
    rho: float = 0.0,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, set[tuple]]:
    """Return (dataset, classes, embeddings, gold_axioms).

    Geometry designed so hard mapping + nearest-mapped-ancestor recovers
    ``tree`` exactly (direct F1 = 1.0):

    * leaf class: one tight blob of ``per_class`` points at its centroid;
    * non-leaf class X with L leaf descendants: ``per_class × L`` points
      spread uniformly over the leaf-descendant centroids (mirroring
      DBpedia typing, where a superclass's extension includes its
      subclasses' instances). Every class then has share 1/depth-ish at
      every node of its subtree, so F1 = 2p·R/(p+R) with p constant is
      strictly maximized at R=1 — the X-subtree top node — which is a
      strict dendrogram ancestor of each child's best node. Optional
      "bridge" blobs between X and each child get weight ``rho``;
    * a far-away distractor root Z keeps the true root of the planted tree
      off the dendrogram root (which hard mapping excludes).
    """
    if tree is None:
        tree = {"B": "A", "C": "A", "D": "B", "E": "B", "F": "C", "G": "C"}
    rng = np.random.RandomState(seed)
    kids: dict[str, list[str]] = {}
    for c, p in tree.items():
        kids.setdefault(p, []).append(c)
    for p in kids:
        kids[p].sort()
    roots = sorted(set(tree.values()) - set(tree))
    names = sorted(set(tree) | set(tree.values())) + ["Z"]

    centroid: dict[str, np.ndarray] = {}
    for r_i, r in enumerate(roots):
        v = np.zeros(dim)
        v[(2 * r_i) % dim] = 4.0
        centroid[r] = v
    zv = np.zeros(dim)
    zv[:] = -6.0
    centroid["Z"] = zv

    def levels(c: str) -> int:
        return 0 if c in roots or c == "Z" else 1 + levels(tree[c])

    def centroid_of(c: str) -> np.ndarray:
        if c in centroid:
            return centroid[c]
        parent_c = centroid_of(tree[c])
        off = rng.randn(dim)
        off /= np.linalg.norm(off)
        centroid[c] = parent_c + off * spread / (2.0 ** (levels(c) - 1))
        return centroid[c]

    for c in names:
        centroid_of(c)

    def leaf_descendants(c: str) -> list[str]:
        if c not in kids:
            return [c]
        out: list[str] = []
        for ch in kids[c]:
            out.extend(leaf_descendants(ch))
        return out

    classes = pd.DataFrame(
        {"class_id": np.arange(len(names), dtype=np.int32), "class_name": names}
    )
    cls_id = dict(zip(classes.class_name, classes.class_id))

    rows, vecs = [], []
    sid = 0
    for c in names:
        comps: list[np.ndarray] = []
        w: list[float] = []
        leaves = leaf_descendants(c) if c in kids else [c]
        if c in kids:  # non-leaf: leaf-descendant blobs (+ optional bridges)
            for lf in leaves:
                comps.append(centroid[lf])
                w.append((1.0 - rho) / len(leaves))
            if rho > 0:
                for ch in kids[c]:
                    comps.append(0.5 * (centroid[c] + centroid[ch]))
                    w.append(rho / len(kids[c]))
        else:
            comps.append(centroid[c])
            w.append(1.0)
        counts = rng.multinomial(per_class * len(leaves), np.asarray(w) / np.sum(w))
        for comp, cnt in zip(comps, counts):
            for _ in range(cnt):
                rows.append((sid, 100_000 + sid, int(cls_id[c])))
                vecs.append(comp + noise * rng.randn(dim))
                sid += 1
    dataset = pd.DataFrame(rows, columns=["sample_id", "entity_id", "class_id"]).astype(
        {"class_id": "int32"}
    )
    embeddings = pd.DataFrame(
        {
            "entity_id": dataset.entity_id.values,
            "vector": [v.astype(np.float32).tolist() for v in vecs],
        }
    )
    gold = set(tree.items())
    return dataset, classes, embeddings, gold


# --------------------------------------------------------------------------
# Expressive-extraction KG: individuals distinguishable only by relations
# --------------------------------------------------------------------------


def gen_expressive_kg_pdf(
    n_poets: int = 60,
    n_novelists: int = 60,
    n_musicians: int = 100,
    n_cities: int = 100,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, dict]:
    """Return (triples, entities, relations, info) where individuals carry
    only a generic type and are separable ONLY by class expressions:

    * poets      — wrote → (a dbo:Poem,  which is_a dbo:Book)
    * novelists  — wrote → (a dbo:Novel, which is_a dbo:Book)
    * musicians  — plays → (a dbo:Instrument)
    * cities     — located_in → (a dbo:Country)

    The planted expressive taxonomy: ⊤ → {∃wrote.Book, ∃plays.Instrument,
    ∃located_in.Country}; ∃wrote.Book → {∃wrote.Poem, ∃wrote.Novel}.
    ``info`` carries the relation/class ids for assertions.
    """
    rng = np.random.RandomState(seed)
    rel_uris = ["rdf:type", "dbo:wrote", "dbo:plays", "dbo:located_in"]
    relations = pd.DataFrame(
        {"id": np.arange(len(rel_uris), dtype=np.int64), "uri": rel_uris}
    )
    class_uris = [
        "dbo:Entity", "dbo:Book", "dbo:Poem", "dbo:Novel",
        "dbo:Instrument", "dbo:Country",
    ]
    n_poems, n_novels, n_instr, n_countries = 25, 25, 12, 12
    ent_uris = list(class_uris)
    ids: dict[str, np.ndarray] = {}
    cursor = len(ent_uris)

    def alloc(prefix: str, n: int) -> np.ndarray:
        nonlocal cursor
        out = np.arange(cursor, cursor + n, dtype=np.int64)
        ent_uris.extend(f"dbr:{prefix}_{i}" for i in range(n))
        cursor += n
        return out

    ids["poem"] = alloc("Poem", n_poems)
    ids["novel"] = alloc("Novel", n_novels)
    ids["instr"] = alloc("Instr", n_instr)
    ids["country"] = alloc("Country", n_countries)
    ids["poet"] = alloc("Poet", n_poets)
    ids["novelist"] = alloc("Novelist", n_novelists)
    ids["musician"] = alloc("Musician", n_musicians)
    ids["city"] = alloc("City", n_cities)
    entities = pd.DataFrame(
        {"id": np.arange(len(ent_uris), dtype=np.int64), "uri": ent_uris}
    )
    cls = {u: i for i, u in enumerate(class_uris)}
    ISA_R, WROTE, PLAYS, LOC = 0, 1, 2, 3
    hs, rs, ts = [], [], []

    def add(h, r, t):
        hs.append(int(h)); rs.append(int(r)); ts.append(int(t))

    # object typing: poems are Poem AND Book; novels Novel AND Book
    for p in ids["poem"]:
        add(p, ISA_R, cls["dbo:Poem"]); add(p, ISA_R, cls["dbo:Book"])
    for nv in ids["novel"]:
        add(nv, ISA_R, cls["dbo:Novel"]); add(nv, ISA_R, cls["dbo:Book"])
    for it in ids["instr"]:
        add(it, ISA_R, cls["dbo:Instrument"])
    for ct in ids["country"]:
        add(ct, ISA_R, cls["dbo:Country"])
    # individuals: generic type + 1-3 distinguishing relations
    for group, rel, targets in (
        ("poet", WROTE, ids["poem"]),
        ("novelist", WROTE, ids["novel"]),
        ("musician", PLAYS, ids["instr"]),
        ("city", LOC, ids["country"]),
    ):
        for e in ids[group]:
            add(e, ISA_R, cls["dbo:Entity"])
            for t in rng.choice(targets, size=rng.randint(1, 4), replace=False):
                add(e, rel, t)
    triples = pd.DataFrame(
        {"h": np.asarray(hs), "r": np.asarray(rs), "t": np.asarray(ts)}
    ).drop_duplicates(ignore_index=True)
    info = {
        "WROTE": WROTE, "PLAYS": PLAYS, "LOC": LOC,
        "Book": cls["dbo:Book"], "Poem": cls["dbo:Poem"],
        "Novel": cls["dbo:Novel"], "Instrument": cls["dbo:Instrument"],
        "Country": cls["dbo:Country"], "Entity": cls["dbo:Entity"],
        "groups": {k: v for k, v in ids.items()},
    }
    return triples, entities, relations, info
