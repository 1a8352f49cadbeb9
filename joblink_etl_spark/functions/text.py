"""Text cleanup scalar functions (reference F10-F14, F19, F20).

Everything stays JVM-side: the emoji class uses Java's
\\p{IsExtended_Pictographic} Unicode property (Java 13+), and the
per-row company-echo regex is built with a Column-typed pattern for
regexp_replace — no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Extended_Pictographic + VS16 (reference stripEmojis_,
# code-LLM-intergration.js:569-577). Java 17's regex lacks the
# \p{Extended_Pictographic} property, so we enumerate the EP ranges
# explicitly — the reference ships the same style of fallback for
# engines without \p support (:572-576), ours just covers the full
# EP set including the SMP emoji planes.
EMOJI_CLASS = (
    "[\\x{00A9}\\x{00AE}\\x{203C}\\x{2049}\\x{2122}\\x{2139}"
    "\\x{2194}-\\x{2199}\\x{21A9}-\\x{21AA}\\x{231A}-\\x{231B}"
    "\\x{2328}\\x{2388}\\x{23CF}\\x{23E9}-\\x{23FA}\\x{24C2}"
    "\\x{25AA}-\\x{25AB}\\x{25B6}\\x{25C0}\\x{25FB}-\\x{25FE}"
    "\\x{2600}-\\x{27BF}\\x{2934}-\\x{2935}\\x{2B00}-\\x{2BFF}"
    "\\x{3030}\\x{303D}\\x{3297}\\x{3299}"
    "\\x{1F000}-\\x{1FFFD}\\x{FE0F}]"
)


def strip_emojis(s: Column) -> Column:
    return F.regexp_replace(s, EMOJI_CLASS, "")


def decode_html(s: Column) -> Column:
    """Minimal entity decode, same five entities and order as the
    reference (decodeHtml_, code-LLM-intergration.js:580-584)."""
    t = F.regexp_replace(s, "(?i)&amp;", "&")
    t = F.regexp_replace(t, "(?i)&lt;", "<")
    t = F.regexp_replace(t, "(?i)&gt;", ">")
    t = F.regexp_replace(t, "(?i)&quot;", '"')
    t = F.regexp_replace(t, "(?i)&#39;|&apos;", "'")
    return t


def regex_escape(s: Column) -> Column:
    """Escape regex metachars in a data value so it can be embedded in
    a dynamic pattern (JS escape at code-LLM-intergration.js:598)."""
    return F.regexp_replace(s, r"([.*+?^${}()|\[\]\\])", r"\\$1")


def clean_role(title: Column, company: Column | None = None) -> Column:
    """Full role cleanup pipeline (reference cleanRole_,
    code-LLM-intergration.js:593-606):
    strip tags → decode entities → de-emoji → drop company echo at
    either end → drop trailing '- City, ST' → drop trailing Req/ID →
    collapse whitespace.

    Golden pairs (reference doc-comment :589-590):
      ('Acme — Senior Software Engineer – Req#8932, CA', 'Acme')
        → 'Senior Software Engineer'
      ('Senior SWE - New York, NY', None) → 'Senior SWE'
    """
    r = F.regexp_replace(F.coalesce(title, F.lit("")), "<[^>]*>", "")
    r = decode_html(r)
    r = strip_emojis(r)
    if company is not None:
        esc = regex_escape(F.coalesce(company, F.lit("")))
        prefix_pat = F.concat(F.lit(r"(?i)^\s*"), esc, F.lit(r"\s*[-–—:]*\s*"))
        suffix_pat = F.concat(F.lit(r"(?i)\s*[-–—:]*\s*"), esc, F.lit(r"\s*$"))
        stripped = F.regexp_replace(
            F.regexp_replace(r, prefix_pat, F.lit("")), suffix_pat, F.lit("")
        )
        r = F.when(F.coalesce(company, F.lit("")) != "", stripped).otherwise(r)
    r = F.regexp_replace(r, r"\s*-\s*[A-Z][a-z]+(?:,?\s*[A-Z]{2})?$", "")
    r = F.regexp_replace(r, r"(?i)\s*[-–—]?\s*((JR|Req|R|ID|Job)[\s#:]*\d+|\d{5,})\s*$", "")
    return F.trim(F.regexp_replace(r, r"\s+", " "))


def clean_role_mvp(title: Column) -> Column:
    """MVP-variant role cleanup (reference F13, cleanRole_ in
    code-Extractor-withoutLLM.js:397-404): strip tags → decode
    entities → de-emoji → collapse whitespace only — no company-echo,
    location, or Req/ID stripping."""
    r = F.regexp_replace(F.coalesce(title, F.lit("")), "<[^>]*>", "")
    r = decode_html(r)
    r = strip_emojis(r)
    return F.trim(F.regexp_replace(r, r"\s+", " "))


def truncate(s: Column, n: int) -> Column:
    """reference F19 truncation guards (invite ≤280, errors ≤300)."""
    return F.substring(s, 1, n)


def format_conf(conf: Column) -> Column:
    """2-decimal confidence for provenance tokens (reference
    conf.toFixed(2), code-LLM-intergration.js:846)."""
    return F.format_string("%.2f", conf)
