"""Rule-based (subj, pred, obj) statement grammar + the row-by-row pure-pandas
reference extractor.

This module is the **parity target**: the Spark pipeline
(sparktax.extract.pipeline) must emit exactly the same triples per turn
(per-turn text-equality invariant, BASELINE.json input_hint). It is the
analog of the reference repo's deterministic TTL statement parser
(reference libs/graph/ttl.py:23-52) re-aimed at transcript text.

Grammar
-------
A statement is ``<Subj> <pred> <Obj>.`` where

* subject / object: capitalized token ``[A-Z][A-Za-z0-9_]*``
* predicate: lowercase token with at least one underscore
  ``[a-z][a-z0-9]*(?:_[a-z0-9]+)+`` (filler words are underscore-free, so
  they can never be predicates)
* terminated by a literal ``.``

A pronoun subject (``He|She|It|They``) refers to the most recent explicit
subject earlier in the same conversation (stable ``turn_idx`` order) — the
cross-turn context path.
"""

from __future__ import annotations

import re

import pandas as pd

SUBJ = r"(?:[A-Z][A-Za-z0-9_]*)"
PRED = r"(?:[a-z][a-z0-9]*(?:_[a-z0-9]+)+)"
_PATTERN = rf"\b({SUBJ})\s+({PRED})\s+({SUBJ})\s*\."
# ASCII grammar by definition: the str and bytes compilations are exactly
# equivalent (multi-byte UTF-8 can never match an ASCII class), which lets
# the Spark hot path run the regex zero-copy on Arrow utf-8 buffers.
STATEMENT_RE = re.compile(_PATTERN, re.ASCII)
STATEMENT_RE_BYTES = re.compile(_PATTERN.encode("ascii"))
PRONOUNS = frozenset({"He", "She", "It", "They"})


def extract_turn(text: str) -> list[tuple[str, str, str]]:
    """All (subj, pred, obj) statements in one turn, in textual order."""
    if not text:
        return []
    return [(m[0], m[1], m[2]) for m in STATEMENT_RE.findall(text)]


def reference_extract_pdf(
    transcripts: pd.DataFrame, resolve_pronouns: bool = False
) -> pd.DataFrame:
    """Row-by-row reference extractor (single-process, deliberately naive).

    Returns (conv_id, turn_idx, subj, pred, obj). With
    ``resolve_pronouns=True``, pronoun subjects are replaced by the most
    recent non-pronoun subject in the same conversation; unresolvable
    pronoun statements are dropped.
    """
    out = []
    ordered = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    last_subj: dict[str, str] = {}
    for row in ordered.itertuples(index=False):
        for subj, pred, obj in extract_turn(row.text):
            if subj in PRONOUNS:
                if not resolve_pronouns:
                    continue
                subj = last_subj.get(row.conv_id, "")
                if not subj:
                    continue
            else:
                last_subj[row.conv_id] = subj
            out.append((row.conv_id, row.turn_idx, subj, pred, obj))
    return pd.DataFrame(
        out, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
    ).astype({"turn_idx": "int32"})
