"""PII redaction: masking semantics, ordering, and count attribution."""

from __future__ import annotations

from dataeng_azure_spotify_spark.functions.pii import redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return redact_pii(df).collect()[0]


def test_all_three_classes_masked(spark):
    r = _one(
        spark,
        "mail a.b+c@site.org or b@x.io, call +44 (0)20-7946 0958, host 192.168.0.1",
    )
    assert r.clean_text == "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>"
    assert (r.n_emails, r.n_ips, r.n_phones) == (2, 1, 1)


def test_no_pii_is_identity(spark):
    r = _one(spark, "no contact details here at all")
    assert r.clean_text == "no contact details here at all"
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)


def test_email_redacted_before_ip_never_rematches(spark):
    # the email tag contains no digits, so the IP pass cannot fire inside it
    r = _one(spark, "ping admin@10.0.0.1.example.com then 10.0.0.1")
    assert r.n_emails == 1 and r.n_ips == 1
    assert r.clean_text == "ping <EMAIL> then <IP>"


def test_phone_requires_plus_prefix(spark):
    # bare digit runs are not phones (too many false positives in prose)
    r = _one(spark, "order 1234567890 ships +1-234-567-8901 today")
    assert r.n_phones == 1
    assert "1234567890" in r.clean_text and "<PHONE>" in r.clean_text


def test_gopher_quality_rules(spark):
    from dataeng_azure_spotify_spark.functions.text import gopher_quality

    good = "the quick brown fox jumps over a lazy dog " * 6  # 60 words, stopwords
    symbols = ("word " * 50) + "### ... ### ... ###"
    short = "too short to pass"
    df = spark.createDataFrame(
        [(1, good), (2, symbols), (3, short)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_quality(df, min_words=40).collect()}
    assert out[1].gopher_pass
    assert not out[2].gopher_pass and out[2].symbol_word_ratio > 0.1
    assert not out[3].gopher_pass and out[3].n_words < 40
    assert abs(out[1].mean_word_len - (33 / 9)) < 1e-7
