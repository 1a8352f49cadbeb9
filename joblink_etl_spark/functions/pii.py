"""PII detection and redaction over text columns.

A training-data pipeline scrubs obvious personal identifiers before
release; this module provides the Column-expression core: per-pattern
match counts and an in-place redaction that replaces each match class
with a fixed token. Extends the reference's contact-handling surface
(emails/links flow through its tracker rows, e.g. apps-scripts/
code-LLM-intergration.js:987-1020 builds outreach text around them)
into a corpus-scale scrub pass.

The patterns are deliberately conservative, RE2-compatible regexes
(no backreferences, no lookaround) so the exact same pattern runs in
Java regex (Spark) and RE2 (DuckDB oracle) with identical semantics.

Scale: pure narrow scan-side work — regexp_extract_all /
regexp_replace are JVM codegen; no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# International-prefix phone: +CC then 6-14 digits/separators then a digit.
PHONE_RE = r"\+\d[\d -]{6,14}\d"


def count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_counts(text: Column) -> dict[str, Column]:
    """Independent per-class match counts on the ORIGINAL text (order
    -independent, unlike redaction which must chain)."""
    return {
        "n_emails": count_matches(text, EMAIL_RE),
        "n_phones": count_matches(text, PHONE_RE),
        "n_ips": count_matches(text, IPV4_RE),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email, then phone, then IPv4 match with a class
    token. Email first: its local part may contain digit runs that
    the looser patterns would otherwise nibble; the replacement
    tokens themselves contain no digits or '@', so later passes never
    touch earlier redactions."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return out
