"""PII redaction (textops.redact_pii): regex lane restricted to syntax
with identical Java-regex / RE2 semantics so the DuckDB gate oracle can
replay every replacement bit-for-bit. These tests pin the single-engine
contract; cross-engine equality is the `redact_pii` oracle's job."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sparktax.textops import PII_PATTERNS, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return redact_pii(df).collect()[0]


def test_each_kind_redacts_and_counts(spark):
    r = _one(
        spark,
        "mail a.b+c@x-y.co or call 555-123-4567, ssn 123-45-6789, host 10.0.0.1 end",
    )
    assert (
        r.text
        == "mail <EMAIL> or call <PHONE>, ssn <SSN>, host <IP> end"
    )
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ip) == (1, 1, 1, 1)


def test_ordering_email_consumes_dotted_quad_host(spark):
    """a@1.2.3.4.co is ONE email (alphabetic TLD): the email pattern runs
    first and consumes the dotted quad; the ip count (computed on the
    already-redacted text) must not double-count it. user@1.2.3.4 has no
    TLD, is NOT an email, and falls through to the ip lane."""
    r = _one(spark, "login a@1.2.3.4.co or user@1.2.3.4 now")
    assert r.text == "login <EMAIL> or user@<IP> now"
    assert (r.n_email, r.n_ip) == (1, 1)


def test_ordering_ssn_before_phone(spark):
    """123-45-6789 is an ssn, not a phone; 555-123-4567 is a phone, not
    an ssn — the two digit-dash shapes never cross-match."""
    r = _one(spark, "123-45-6789 and 555-123-4567")
    assert r.text == "<SSN> and <PHONE>"
    assert (r.n_ssn, r.n_phone) == (1, 1)


def test_word_boundaries_hold(spark):
    # digits glued to the pattern break \b: not redacted
    r = _one(spark, "id 9123-45-67890 stays, 1.2.3.4.5 too")
    assert r.n_ssn == 0 and "9123-45-67890" in r.text
    # 1.2.3.4.5: the ip regex has no \b-safe anchor mid-run; whichever
    # prefix matches, SOMETHING is redacted deterministically — pin it
    assert r.text.count("<IP>") == r.n_ip


def test_null_and_kinds_subset(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a@b.co 10.0.0.1")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in redact_pii(df, kinds=("email",)).collect()}
    assert out[1].text == "" and out[1].n_email == 0
    assert out[2].text == "<EMAIL> 10.0.0.1" and out[2].n_email == 1
    assert "n_ip" not in out[2].asDict()


def test_with_counts_false_keeps_schema(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    out = redact_pii(df, with_counts=False)
    assert out.columns == ["doc_id", "text"]


def test_multiple_spans_per_doc(spark):
    r = _one(spark, "a@b.co c@d.co 10.0.0.1 10.0.0.2 10.0.0.3")
    assert r.n_email == 2 and r.n_ip == 3
    assert r.text == "<EMAIL> <EMAIL> <IP> <IP> <IP>"


@pytest.mark.parametrize("kind,pat", PII_PATTERNS)
def test_duckdb_replays_each_pattern(spark, kind, pat):
    """Cross-engine contract per pattern on adversarial text (the gate
    checks the composed chain on real documents; this isolates which
    pattern diverges if one ever does)."""
    texts = [
        "mail a.b+c@x-y.co or call 555-123-4567, ssn 123-45-6789, host 10.0.0.1",
        "login user@1.2.3.4 now",
        "id 9123-45-67890 stays, 1.2.3.4.5 too",
        "edge a@b.co. trailing dot and (555-123-4567) parens",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = [
        (r.i, r.red)
        for r in df.select(
            "i", F.regexp_replace("text", pat, f"<{kind.upper()}>").alias("red")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        (i, con.execute(
            "select regexp_replace(?, ?, ?, 'g')", [t, pat, f"<{kind.upper()}>"]
        ).fetchone()[0])
        for i, t in enumerate(texts)
    ]
    assert sorted(got) == sorted(want)
