"""JSON-LD JobPosting extraction (reference F6/F7).

The one place the reference's logic genuinely needs Python: a
recursive search over arbitrarily-shaped JSON (parseJsonLdJobPosting_
+ findJobPosting_, code-LLM-intergration.js:509-539). Implemented as
an Arrow-batched pandas UDF returning a (company, role) struct —
vectorized transfer, depth-capped recursion.
"""

from __future__ import annotations

import json
import re as _re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

LDJSON_RE = _re.compile(
    r"<script[^>]+type=[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    _re.I | _re.S,
)

_MAX_DEPTH = 64


def find_job_posting(node, depth: int = 0):
    """Recursive @type~'jobposting' search; descends arrays, @graph,
    then every object-valued field in key order (reference
    findJobPosting_, code-LLM-intergration.js:528-539)."""
    if node is None or depth > _MAX_DEPTH:
        return None
    if isinstance(node, list):
        for n in node:
            r = find_job_posting(n, depth + 1)
            if r is not None:
                return r
        return None
    if isinstance(node, dict):
        t = node.get("@type")
        tstr = ",".join(map(str, t)).lower() if isinstance(t, list) else str(t or "").lower()
        if "jobposting" in tstr:
            return node
        if "@graph" in node:
            r = find_job_posting(node["@graph"], depth + 1)
            if r is not None:
                return r
        for v in node.values():
            if isinstance(v, (dict, list)):
                r = find_job_posting(v, depth + 1)
                if r is not None:
                    return r
    return None


def extract_job_posting(html: str) -> tuple[str, str]:
    """First parseable ld+json block containing a JobPosting →
    (company, role); ('','') otherwise (reference
    parseJsonLdJobPosting_, code-LLM-intergration.js:509-525).
    Deviation: a hiringOrganization object without a name yields ''
    (the JS stringifies the object to '[object Object]')."""
    if not html:
        return ("", "")
    for m in LDJSON_RE.finditer(html):
        raw = m.group(1).strip()
        try:
            tree = json.loads(raw)
        except (ValueError, RecursionError):
            continue
        jp = find_job_posting(tree)
        if jp is not None:
            org = jp.get("hiringOrganization")
            if isinstance(org, dict):
                name = org.get("name") or ""
            else:
                name = org if isinstance(org, str) else ""
            return (str(name or ""), str(jp.get("title") or ""))
    return ("", "")


JOBPOSTING_SCHEMA = StructType(
    [StructField("company", StringType()), StructField("role", StringType())]
)


@pandas_udf(returnType=JOBPOSTING_SCHEMA)
def jsonld_job_posting(html: pd.Series) -> pd.DataFrame:
    out = [extract_job_posting(h) for h in html]
    return pd.DataFrame(out, columns=["company", "role"])


def _posting_fields(jp: dict) -> tuple[str, str]:
    org = jp.get("hiringOrganization")
    if isinstance(org, dict):
        name = org.get("name") or ""
    else:
        name = org if isinstance(org, str) else ""
    return (str(name or ""), str(jp.get("title") or ""))


def all_job_postings(html: str):
    """EVERY JobPosting across all ld+json blocks of a page (the
    single-result extract_job_posting stops at the first) — job-board
    listing pages embed dozens. Yields (block_index, company, role)."""
    if not html:
        return
    for bi, m in enumerate(LDJSON_RE.finditer(html)):
        raw = m.group(1).strip()
        try:
            tree = json.loads(raw)
        except (ValueError, RecursionError):
            continue
        jp = find_job_posting(tree)
        if jp is not None:
            company, role = _posting_fields(jp)
            yield (bi, company, role)


def make_postings_udtf():
    """Python UDTF (Spark 4): one HTML page row → one row per embedded
    JobPosting, with block provenance. The UDTF boundary is the
    set-returning twin of the scalar pandas-UDF extractor — register
    and use via LATERAL:

        spark.udtf.register("extract_postings", make_postings_udtf())
        SELECT p.* FROM pages, LATERAL extract_postings(html) p
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="block_index: int, company: string, role: string")
    class ExtractPostings:
        def eval(self, html: str):
            yield from all_job_postings(html or "")

    return ExtractPostings
