"""PII scrub semantics: counts, placeholders, redaction order, and the
Java-regex/RE2 common-subset contract."""

from rex_spark.operators.redaction import scrub_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return scrub_pii(df).collect()[0]


def test_email_url_phone_counts_and_placeholders(spark):
    r = _one(
        spark,
        "contact alice.johnson+hr@acme-corp.io via https://x.test/a?b=c "
        "or +1 555-123-4567",
    )
    assert (r["n_emails"], r["n_urls"], r["n_phones"]) == (1, 1, 1)
    assert r["scrubbed"] == "contact <EMAIL> via <URL> or <PHONE>"


def test_short_digit_runs_not_phones(spark):
    r = _one(spark, "just 123 and 4567 digits")
    assert r["n_phones"] == 0
    assert r["scrubbed"] == "just 123 and 4567 digits"


def test_multiple_matches_counted(spark):
    r = _one(spark, "a@b.co c@d.org and http://u.test http://v.test")
    assert r["n_emails"] == 2 and r["n_urls"] == 2
    assert r["scrubbed"] == "<EMAIL> <EMAIL> and <URL> <URL>"


def test_url_redacted_after_email_keeps_order_stable(spark):
    # the fixed email->url order means an address glued to a url is
    # resolved the same way on both engines
    r = _one(spark, "ping a@b.co http://c.test/a@d.co end")
    # email inside the url path is redacted FIRST (it matches EMAIL_RE),
    # splitting the url text before URL_RE runs — deterministic on both
    assert r["n_emails"] == 2
    assert "<EMAIL>" in r["scrubbed"] and r["scrubbed"].endswith("end")


def test_vertical_tab_is_not_a_url_terminator(spark):
    # the explicit [ \t\n\r] class (NOT \s) means \x0B does not end a
    # url on either engine — the Java-vs-RE2 divergence the module
    # docstring calls out
    r = _one(spark, "see http://x.test/a\x0bb end")
    assert r["n_urls"] == 1
    assert r["scrubbed"] == "see <URL> end"
