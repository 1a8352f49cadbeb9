"""URL scalar functions (reference F1/F2/F8/F9).

All pure Column expressions — JVM-side, whole-stage-codegen friendly,
no Python in the hot path. Reference semantics from
apps-scripts/code-LLM-intergration.js (cited per function).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The 14 tracking params stripped by canonicalization
# (reference code-LLM-intergration.js:615). Deletion is
# case-sensitive, matching JS URLSearchParams.delete.
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gh_src", "src", "source", "vq_campaign", "vq_source",
    "__jvst", "__jvsd", "codes", "gh_jid",
]


def host_from_url(u: Column) -> Column:
    """Hostname, lowercased, leading 'www.' stripped; '' when the URL
    doesn't parse (reference hostFromUrl_, code-LLM-intergration.js:124-127).
    """
    # try_parse_url: Spark 4 runs ANSI mode, where parse_url raises on
    # malformed input; the reference returns '' there (JS catch).
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    return F.coalesce(F.regexp_replace(host, r"^www\.", ""), F.lit(""))


def make_canonical(u: Column) -> Column:
    """Strip the 14 tracking params, preserve everything else
    (reference makeCanonical_, code-LLM-intergration.js:612-619).

    Implemented as base/query/fragment re-assembly with a
    higher-order filter over the split query string — exact param
    semantics matter because canonical URLs are the dedup key.
    Deviation from JS URL.toString(): no percent-encoding or
    host-case normalization of the non-query parts (we treat the
    input as already well-formed; dedup only needs determinism).
    """
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    frag = F.regexp_extract(u, r"(#.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.split_part(p, F.lit("="), F.lit(1)).isin(TRACKING_PARAMS),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        base,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        frag,
    )


def nice_case(slug: Column) -> Column:
    """Slug 'acme-corp' → 'Acme Corp' (reference niceCase_,
    code-LLM-intergration.js:542). Uses initcap — identical for the
    lowercase slugs this ever receives (guessCompanyFromUrl_
    lowercases its input first); differs from JS only for mixed-case
    input, which cannot occur on that path.
    """
    return F.initcap(
        F.trim(F.regexp_replace(F.regexp_replace(slug, "[-_]+", " "), r"\s+", " "))
    )


# ATS URL → company-slug patterns, in reference priority order
# (guessCompanyFromUrl_, code-LLM-intergration.js:551-564). Applied to
# the LOWERCASED url, exactly as the reference does — which makes the
# final paylocity pattern (case-sensitive '/Details/') unreachable
# there too; kept for line-by-line parity.
ATS_SLUG_PATTERNS = [
    r"(?:job-boards|boards)\.greenhouse\.io/([^/?#]+)/jobs/",
    r"jobs\.lever\.co/([^/?#]+)/",
    r"jobs\.ashbyhq\.com/([^/?#]+)/",
    r"apply\.workable\.com/([^/?#]+)/",
    r"jobs\.smartrecruiters\.com/([^/?#]+)/",
    r"jobs\.jobvite\.com/([^/?#]+)/",
    r"ats\.rippling\.com/([^/?#]+)/",
    r"myworkdayjobs\.com/(?:[a-z-]+/)?([^/?#]+)/",
    r"workdayjobs\.com/(?:[a-z-]+/)?([^/?#]+)/",
    r"recruiting\.paylocity\.com/.*/Details/\d+/([^/?#]+)",
]


def guess_company_from_url(u: Column) -> Column:
    """First-matching ATS pattern → nice-cased slug, else ''
    (reference guessCompanyFromUrl_, code-LLM-intergration.js:551-564).
    coalesce() preserves the short-circuit priority order.
    """
    lu = F.lower(u)
    candidates = [
        F.nullif(F.regexp_extract(lu, p, 1), F.lit("")) for p in ATS_SLUG_PATTERNS
    ]
    return F.coalesce(nice_case(F.coalesce(*candidates, F.lit(""))), F.lit(""))
