"""PII-pattern redaction over the documents table (training-data
pipeline: the scrub pass every web corpus runs before training).

Pure JVM expressions (regexp_extract_all for counts, chained
regexp_replace for the scrub), so the op is SQL-oracle-able and rides
whole-stage codegen.  Patterns are written to the COMMON subset of
Java regex and RE2 semantics so the DuckDB oracle matches exactly:

- explicit whitespace classes ``[ \\t\\n\\r]`` instead of ``\\s`` (Java's
  ``\\s`` includes \\x0B, RE2's does not);
- no lookaround / backreferences (absent from RE2);
- redaction order email -> url -> phone is fixed and mirrored in the
  oracle (an email inside a url must resolve identically).

Counts are taken BEFORE redaction; the scrubbed text is surfaced as an
md5 so the driver hash can verify the byte result without shipping
full documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ \t\n\r]+"
PHONE_RE = r"\+?[0-9][0-9 -]{7,}[0-9]"

_PATTERNS = [
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_urls", URL_RE, "<URL>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
]


def scrub_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (original columns, n_emails, n_urls, n_phones,
    scrubbed) with PII spans replaced by typed placeholders."""
    # NULL text would diverge from the DuckDB oracle (Spark's
    # size(regexp_extract_all(NULL)) -> -1 vs DuckDB's len(...) -> NULL),
    # so both sides coalesce to '' before matching.
    out = documents
    scrubbed = F.coalesce(F.col(text_col), F.lit(""))
    for name, pat, repl in _PATTERNS:
        out = out.withColumn(
            name,
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")), F.lit(pat), F.lit(0)
                )
            ),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed", scrubbed)


def pii_summary(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Driver-hash-friendly surface: per-doc counts + md5 of the
    scrubbed text (full scrub verified byte-for-byte via the hash)."""
    s = scrub_pii(documents, text_col)
    return s.select(
        "doc_id",
        "n_emails",
        "n_urls",
        "n_phones",
        F.md5("scrubbed").alias("scrubbed_md5"),
    )
