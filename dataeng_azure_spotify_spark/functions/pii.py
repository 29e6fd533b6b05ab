"""PII redaction — masking of emails / phone numbers / IPv4 addresses in
a text column, a standard pre-training scrub pass (beyond-reference
LLM-curation surface; the reference's only text validation is the email
regex of U1, `local_spotify_dab/src/utils/udfs.py`).

All masking is chained JVM-side ``regexp_replace`` — whole-stage
codegen, no UDF, embarrassingly parallel, so the pass is scan-bound at
any corpus size. The patterns deliberately use only character classes
(no ``\\d`` / ``\\b`` shorthands): they mean the same thing in Java
regex (Spark), RE2 (DuckDB oracle), and POSIX engines, and they never
hit string-literal backslash-escaping differences between SQL dialects.

Counts are measured on the PROGRESSIVELY redacted text (emails first,
then IPs, then phones) so a token is attributed to exactly one PII
class regardless of pattern overlap, and the counts always equal the
number of replacements actually made.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: local@domain.tld — class-only pattern, identical across regex engines
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
#: dotted quad; bounds checked loosely (1-3 digits per octet)
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
#: international-ish phone: leading +, then >= 7 phone chars, digit last
PHONE_RE = "[+][0-9][0-9()., -]{5,}[0-9]"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("long")


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, clean_text, n_emails, n_ips, n_phones).

    Redaction order is emails → IPv4 → phones: the earlier classes'
    tags contain no digits, so later patterns can never re-match inside
    an already-redacted span.
    """
    raw = F.col(text_col)
    t1 = F.regexp_replace(raw, EMAIL_RE, EMAIL_TAG)
    t2 = F.regexp_replace(t1, IPV4_RE, IPV4_TAG)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TAG)
    return df.select(
        F.col(id_col),
        t3.alias("clean_text"),
        _count(raw, EMAIL_RE).alias("n_emails"),
        _count(t1, IPV4_RE).alias("n_ips"),
        _count(t2, PHONE_RE).alias("n_phones"),
    )
