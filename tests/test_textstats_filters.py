"""Repetition filters + PII scan/redact (sketchlib/textstats.py):
hand-computed fractions, no-shuffle plan shape, byte-exact redaction."""

from __future__ import annotations

import pytest

from sketchlib.textstats import pii_redact, pii_stats, repetition_stats


def test_repetition_fractions_hand_computed(spark):
    rows = [
        # 2-grams: "a b" x2 dup (6 chars of 9); no dup 3-gram
        (1, "a b a b c"),
        # two identical lines: dup_line_frac 1/2, char frac 1/2;
        # 2-grams of [x,y,x,y]: "x y","y x","x y" -> dup "x y" x2 = 6
        # chars of len("x y\nx y")=7; 3-grams: "x y x","y x y" unique
        (2, "x y\nx y"),
        (3, "all unique words here"),
        (4, ""),  # guards: no division blowups
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["dup_2gram_char_frac"] == pytest.approx(
        int(6e6 / 9) / 1e6)
    assert got[1]["dup_3gram_char_frac"] == 0.0
    assert got[2]["dup_line_frac"] == 0.5
    assert got[2]["dup_line_char_frac"] == 0.5
    assert got[2]["dup_2gram_char_frac"] == pytest.approx(
        int(6e6 / 7) / 1e6)
    assert got[2]["dup_3gram_char_frac"] == 0.0
    assert got[3] == (3, 0.0, 0.0, 0.0, 0.0)
    assert got[4] == (4, 0.0, 0.0, 0.0, 0.0)


def test_repetition_caps_at_one(spark):
    # "z z z z": 2-gram "z z" x3 -> 3*3=9 chars > 7 doc chars -> cap 1
    df = spark.createDataFrame([(1, "z z z z")], ["doc_id", "text"])
    r = repetition_stats(df).collect()[0]
    assert r["dup_2gram_char_frac"] == 1.0


def test_repetition_no_shuffle(spark):
    from .conftest import n_shuffles, plan_of
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert n_shuffles(plan_of(repetition_stats(df))) == 0


def test_pii_stats_and_redact(spark):
    rows = [
        (1, "mail Bob.Smith+1@Example.COM or 10.0.0.1 or "
            "+1 (555) 010-9999 ok"),
        (2, "no pii at all in this one"),
        (3, "two mails a@b.io c@d.net and ip 192.168.0.1"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"],
            got[1]["has_pii"]) == (1, 1, 1, True)
    assert got[2]["has_pii"] is False
    assert (got[3]["n_email"], got[3]["n_ipv4"]) == (2, 1)

    red = {r["doc_id"]: r["redacted"] for r in pii_redact(df).collect()}
    assert red[1] == "mail <EMAIL> or <IPV4> or <PHONE> ok"
    assert red[2] == "no pii at all in this one"
    assert red[3] == "two mails <EMAIL> <EMAIL> and ip <IPV4>"


def test_pii_no_shuffle(spark):
    from .conftest import n_shuffles, plan_of
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    assert n_shuffles(plan_of(pii_stats(df))) == 0
    assert n_shuffles(plan_of(pii_redact(df))) == 0
