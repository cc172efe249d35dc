"""Extraction parity: Spark Arrow lane == pure-pandas reference extractor,
per-turn (the text-equality invariant from BASELINE.json input_hint)."""

from __future__ import annotations

import pandas as pd

from sparktax import synth
from sparktax.extract import (
    extract_mentions,
    extract_triples,
    extract_triples_contextual,
    reference_extract_pdf,
)

KEY = ["conv_id", "turn_idx", "subj", "pred", "obj"]


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)


def test_statement_grammar_roundtrip():
    from sparktax.extract.rules import extract_turn

    text = "well Ada_Lovelace works_at Acme_Corp. then note It is_a Thing."
    assert extract_turn(text) == [
        ("Ada_Lovelace", "works_at", "Acme_Corp"),
        ("It", "is_a", "Thing"),
    ]
    # filler words can't be predicates; statements need the trailing dot
    assert extract_turn("Ada works Acme.") == []
    assert extract_turn("Ada_Lovelace works_at Acme_Corp") == []


def test_extract_matches_reference(spark):
    pdf, gold = synth.gen_transcripts_pdf(n_convs=40, seed=7)
    tdf = synth.transcripts_to_spark(spark, pdf)

    got = _sorted(extract_triples(tdf).toPandas())
    ref = _sorted(reference_extract_pdf(pdf))
    pd.testing.assert_frame_equal(got[KEY], ref[KEY], check_dtype=False)


def test_extract_recovers_planted_gold(spark):
    pdf, gold = synth.gen_transcripts_pdf(n_convs=40, seed=11)
    tdf = synth.transcripts_to_spark(spark, pdf)
    got = extract_triples(tdf).toPandas()

    got_set = set(map(tuple, got[KEY].itertuples(index=False)))
    gold_set = set(map(tuple, gold[KEY].itertuples(index=False)))
    # recall: every planted statement is recovered
    assert gold_set <= got_set
    # precision ≥ 0.95: extraction may legitimately match nothing else at
    # seed defaults, but allow the grammar to fire on statement-like noise
    assert len(got_set & gold_set) / max(len(got_set), 1) >= 0.95


def test_contextual_matches_reference(spark):
    pdf, _ = synth.gen_transcripts_pdf(n_convs=30, seed=3)
    # plant pronoun statements manually in a copy
    pdf = pdf.copy()
    mask = pdf.index[::7]
    pdf.loc[mask, "text"] = pdf.loc[mask, "text"] + " It works_at Globex."
    tdf = synth.transcripts_to_spark(spark, pdf)

    got = _sorted(extract_triples_contextual(tdf).toPandas())
    ref = _sorted(reference_extract_pdf(pdf, resolve_pronouns=True))
    pd.testing.assert_frame_equal(got[KEY], ref[KEY], check_dtype=False)


def test_mentions_have_spans(spark):
    pdf, _ = synth.gen_transcripts_pdf(n_convs=10, seed=5)
    tdf = synth.transcripts_to_spark(spark, pdf)
    m = extract_mentions(tdf).toPandas()
    assert set(m["kind"]) <= {"subj", "obj"}
    assert (m["span_end"] > m["span_start"]).all()
    # spans point at the actual surface
    text_by_turn = pdf.set_index(["conv_id", "turn_idx"]).text
    for row in m.sample(min(len(m), 50), random_state=0).itertuples(index=False):
        t = text_by_turn.loc[(row.conv_id, row.turn_idx)]
        assert t[row.span_start : row.span_end] == row.surface


def _reference_mentions(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-row str-regex mention extractor (the round-1 semantics)."""
    from sparktax.extract.rules import STATEMENT_RE

    recs = []
    for row in pdf.itertuples(index=False):
        for m in STATEMENT_RE.finditer(row.text or ""):
            recs.append((row.conv_id, row.turn_idx, m.group(1), "subj", m.start(1), m.end(1)))
            recs.append((row.conv_id, row.turn_idx, m.group(3), "obj", m.start(3), m.end(3)))
    return pd.DataFrame(
        recs, columns=["conv_id", "turn_idx", "surface", "kind", "span_start", "span_end"]
    )


MKEY = ["conv_id", "turn_idx", "span_start", "kind"]


def test_mentions_match_per_row_reference(spark):
    pdf, _ = synth.gen_transcripts_pdf(n_convs=30, seed=17)
    tdf = synth.transcripts_to_spark(spark, pdf)
    got = extract_mentions(tdf).toPandas().sort_values(MKEY, kind="mergesort").reset_index(drop=True)
    ref = _reference_mentions(pdf).sort_values(MKEY, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_mentions_non_ascii_char_spans(spark):
    """Multi-byte UTF-8 before/around statements: byte→char conversion must
    reproduce the str-regex character spans exactly."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": [0, 1, 0, 1],
            "role": ["user"] * 4,
            "text": [
                "héllo wörld — Ada_Lovelace works_at Acme_Corp. fin",
                "日本語テキスト Foo is_a Bar. 終わり",
                "no statements here, just ünïcödé",
                "Ω prefix Baz_1 linked_to Qux_2. Über café — X9 sub_of Y8.",
            ],
            "tool": [""] * 4,
        }
    )
    pdf["ts"] = pd.Timestamp("2026-01-01")
    tdf = synth.transcripts_to_spark(spark, pdf)
    got = extract_mentions(tdf).toPandas().sort_values(MKEY, kind="mergesort").reset_index(drop=True)
    ref = _reference_mentions(pdf).sort_values(MKEY, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    text_by_turn = pdf.set_index(["conv_id", "turn_idx"]).text
    for row in got.itertuples(index=False):
        t = text_by_turn.loc[(row.conv_id, row.turn_idx)]
        assert t[row.span_start : row.span_end] == row.surface


def test_contextual_skewed_conversations(spark):
    """Hot conversations (20x turns) flow through the window path and stay
    parity-exact — the skew-handling evidence for the contextual lane."""
    pdf, _ = synth.gen_transcripts_pdf(n_convs=25, seed=13, skew=True)
    sizes = pdf.groupby("conv_id").size()
    assert sizes.max() > 10 * sizes.median()  # the fixture really is skewed
    pdf = pdf.copy()
    mask = pdf.index[::5]
    pdf.loc[mask, "text"] = pdf.loc[mask, "text"] + " They works_at Initech."
    tdf = synth.transcripts_to_spark(spark, pdf).repartition(8)
    got = _sorted(extract_triples_contextual(tdf).toPandas())
    ref = _sorted(reference_extract_pdf(pdf, resolve_pronouns=True))
    pd.testing.assert_frame_equal(got[KEY], ref[KEY], check_dtype=False)
