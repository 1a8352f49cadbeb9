"""HTML signal extraction (reference F3/F4/F5/F14, P6).

Pure regex Column expressions — the reference mines HTML with JS
RegExp (apps-scripts/code-LLM-intergration.js:485-502, 968-975);
we use the Java regex engine via regexp_extract/regexp_replace with
(?i)/(?s) flags replacing JS 'i' flags and [\\s\\S] idioms.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .predicates import is_generic_title


def get_meta(html: Column, key: str, attr: str = "property") -> Column:
    """<meta property|name=key content=...> extractor (reference
    getMeta_, code-LLM-intergration.js:485-489)."""
    pat = (
        f"(?i)<meta[^>]+{attr}=[\"']{_re.escape(key)}[\"']"
        f"[^>]*content=[\"']([^\"']+)[\"']"
    )
    return F.trim(F.regexp_extract(html, pat, 1))


def get_title(html: Column) -> Column:
    """<title> text, whitespace-collapsed (reference getTitle_,
    code-LLM-intergration.js:492-495)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1), r"\s+", " "
        )
    )


def get_h1(html: Column) -> Column:
    """First <h1>, inner tags stripped, ws collapsed (reference
    getH1_, code-LLM-intergration.js:498-502)."""
    inner = F.regexp_extract(html, r"(?is)<h1[^>]*>(.*?)</h1>", 1)
    return F.trim(F.regexp_replace(F.regexp_replace(inner, "<[^>]+>", " "), r"\s+", " "))


def text_preview(html: Column, limit: int = 1200) -> Column:
    """Drop scripts/styles/tags, collapse ws, truncate (reference
    textPreview_, code-LLM-intergration.js:968-975)."""
    t = F.regexp_replace(html, r"(?is)<script.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style.*?</style>", " ")
    t = F.regexp_replace(t, "<[^>]+>", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.substring(t, 1, limit)


def has_jsonld(html: Column) -> Column:
    return html.rlike(r"(?i)<script[^>]+application/ld\+json")


def has_useful_signal(html: Column) -> Column:
    """JSON-LD present OR a non-generic h1/og:title/title (reference
    hasUsefulSignal_, code-LLM-intergration.js:321-332)."""
    h1 = get_h1(html)
    og_title = get_meta(html, "og:title", "property")
    title = get_title(html)
    good_title = (
        ((h1 != "") & ~is_generic_title(h1))
        | ((og_title != "") & ~is_generic_title(og_title))
        | ((title != "") & ~is_generic_title(title))
    )
    return F.coalesce((html != "") & (has_jsonld(html) | good_title), F.lit(False))
