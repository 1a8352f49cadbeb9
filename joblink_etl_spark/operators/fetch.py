"""Tiered fetch cascade (SURVEY.md §2.9; reference fetchSmartFree_,
apps-scripts/code-LLM-intergration.js:439-480).

The reference branches per row (API → direct → renderer → aggregator
unwrap → last resort). Here each tier is a DataFrame pass over the
SHRINKING SUBSET that still needs work, then one union — the
set-at-a-time spelling of the same cheap→expensive cost model. Each
tier's UDF output is cached so deriving the remainder subset never
re-fires the side-effecting fetch (SURVEY §4 'tiered execution').

HTTP happens in Arrow-batched pandas UDFs marked nondeterministic
(so Catalyst won't re-execute or reorder them past filters); the ATS
href unwrap scan is pure JVM regex. At scale each tier fans out per
partition; per-executor rate limiting would live inside the client.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..functions.html import has_useful_signal
from ..functions.predicates import is_aggregator_host, is_ats_host
from ..functions.url import host_from_url, make_canonical

# reference fetchViaAtsApis_ URL patterns (:363, :377)
GH_URL_RE = re.compile(r"https?://(?:boards|job-boards)\.greenhouse\.io/([^/?#]+)/jobs/(\d+)", re.I)
LEVER_URL_RE = re.compile(r"https?://jobs\.lever\.co/([^/?#]+)/([^/?#]+)", re.I)
ATS_API_SPARK_RE = (
    r"(?i)https?://((?:boards|job-boards)\.greenhouse\.io/[^/?#]+/jobs/\d+"
    r"|jobs\.lever\.co/[^/?#]+/[^/?#]+)"
)

FETCH_SCHEMA = StructType(
    [
        StructField("status", IntegerType()),
        StructField("final_url", StringType()),
        StructField("html", StringType()),
        StructField("err", StringType()),
    ]
)

API_SCHEMA = StructType(
    [
        StructField("ok", IntegerType()),
        StructField("status", IntegerType()),
        StructField("final_url", StringType()),
        StructField("provider", StringType()),
        StructField("api_company", StringType()),
        StructField("api_role", StringType()),
        StructField("err", StringType()),
    ]
)

RESULT_COLS = ["status", "final_url", "html", "provider", "api_company", "api_role", "fetch_error"]


def _nice_case(slug: str) -> str:
    """Python twin of functions/url.nice_case (reference niceCase_
    :542) for slugs arriving through the API path."""
    words = re.sub(r"\s+", " ", re.sub(r"[-_]+", " ", slug)).strip().split(" ")
    return " ".join(w[:1].upper() + w[1:] for w in words if w)


def _api_fetch_one(client, url: str):
    m = GH_URL_RE.search(url)
    if m:
        slug, jid = m.group(1).lower(), m.group(2)
        status, _, body = client.fetch(
            f"https://boards-api.greenhouse.io/v1/boards/{slug}/jobs/{jid}"
        )
        if status < 400:
            try:
                role = json.loads(body).get("title") or ""
            except ValueError:
                role = ""
            return (1, 200, f"https://boards.greenhouse.io/{slug}/jobs/{jid}", "gh-api", _nice_case(slug), role)
    m = LEVER_URL_RE.search(url)
    if m:
        slug, jid = m.group(1).lower(), m.group(2).lower()
        status, _, body = client.fetch(
            f"https://api.lever.co/v0/postings/{slug}/{jid}?mode=json"
        )
        if status < 400:
            try:
                data = json.loads(body)
                role = data.get("text") or data.get("title") or ""
            except ValueError:
                role = ""
            return (1, 200, f"https://jobs.lever.co/{slug}/{jid}", "lever-api", _nice_case(slug), role)
    return (0, 0, "", "", "", "")


def make_api_udf(client):
    """Client exceptions surface in 'err' (the reference lets
    UrlFetchApp throws propagate to the item-level catch → Status
    error, :915-918); dead-lettering is the caller's job."""

    @pandas_udf(API_SCHEMA)
    def api_fetch(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for u in urls:
            try:
                rows.append(_api_fetch_one(client, u) + (None,))
            except Exception as e:  # noqa: BLE001
                rows.append((0, 0, "", "", "", "", str(e)[:300]))
        return pd.DataFrame(rows, columns=[f.name for f in API_SCHEMA.fields])

    return api_fetch.asNondeterministic()


def make_http_udf(client):
    @pandas_udf(FETCH_SCHEMA)
    def direct_fetch(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for u in urls:
            try:
                rows.append(tuple(client.fetch(u)) + (None,))
            except Exception as e:  # noqa: BLE001
                rows.append((0, None, None, str(e)[:300]))
        return pd.DataFrame(rows, columns=["status", "final_url", "html", "err"])

    return direct_fetch.asNondeterministic()


def make_render_udf(client):
    """Renderer failures are ABSORBED as null results, matching the
    reference (fetchViaRenderer_ returns null on any error,
    :398-414) — only http/API client errors dead-letter."""

    @pandas_udf(FETCH_SCHEMA)
    def render_fetch(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for u in urls:
            try:
                r = client.render(u)
            except Exception:  # noqa: BLE001 — absorbed like the JS null
                r = None
            rows.append((tuple(r) if r else (0, None, None)) + (None,))
        return pd.DataFrame(rows, columns=["status", "final_url", "html", "err"])

    return render_fetch.asNondeterministic()


def first_ats_link(html) -> F.Column:
    """First <a href> whose host is a known ATS — pure JVM regex scan
    (reference findFirstAtsLinkIn_, :421-428)."""
    hrefs = F.regexp_extract_all(html, F.lit("""(?i)href=["'](https?://[^"']+)["']"""), 1)
    ats = F.filter(hrefs, lambda u: is_ats_host(host_from_url(u)))
    # try_element_at: ANSI mode makes element_at throw on empty arrays
    return F.try_element_at(ats, F.lit(1))


def _as_result(df: DataFrame, provider, status, final_url, html, api_company=None, api_role=None, fetch_error=None) -> DataFrame:
    return df.withColumns(
        {
            "status": status,
            "final_url": final_url,
            "html": F.coalesce(html, F.lit("")),
            "provider": provider,
            "api_company": F.coalesce(api_company if api_company is not None else F.lit(""), F.lit("")),
            "api_role": F.coalesce(api_role if api_role is not None else F.lit(""), F.lit("")),
            "fetch_error": F.coalesce(fetch_error if fetch_error is not None else F.lit(""), F.lit("")),
        }
    )


def fetch_smart(df: DataFrame, http_client, renderer_client, url_col: str = "url") -> DataFrame:
    """Run the full cascade; adds RESULT_COLS to every input row.

    Tier flow (matching :439-480):
      1 ATS API  →  2 direct(useful?)  →  3 renderer(useful?)  →
      4 aggregator unwrap (API → direct → renderer on the ATS href,
        provider suffixed '-unwrapped')  →  5 last resort
    """
    url = F.col(url_col)
    api_udf = make_api_udf(http_client)
    http_udf = make_http_udf(http_client)
    render_udf = make_render_udf(renderer_client)
    # input columns colliding with result names (e.g. a queue's own
    # 'status') are replaced by the fetch results
    passthrough = [c for c in df.columns if c not in RESULT_COLS]

    # --- tier 1: ATS APIs on the pattern-matching subset
    is_api_shaped = url.rlike(ATS_API_SPARK_RE)
    t1 = df.filter(is_api_shaped).withColumn("_api", api_udf(url)).cache()
    api_err_done = _as_result(
        t1.filter(F.col("_api.err").isNotNull()),
        F.lit("gh-api"), F.lit(0), url, F.lit(""), None, None, F.col("_api.err"),
    ).select(*passthrough, *RESULT_COLS)
    api_done = _as_result(
        t1.filter(F.col("_api.ok") == 1),
        F.col("_api.provider"),
        F.col("_api.status"),
        make_canonical(F.col("_api.final_url")),
        F.lit(""),
        F.col("_api.api_company"),
        F.col("_api.api_role"),
    ).select(*passthrough, *RESULT_COLS)

    # --- tier 2: direct fetch for everyone else (incl. API misses)
    t2_in = df.filter(~is_api_shaped).unionByName(
        t1.filter(F.col("_api.ok") == 0).filter(F.col("_api.err").isNull()).drop("_api")
    )
    t2_all = t2_in.withColumn("_direct", http_udf(url)).cache()
    direct_err_done = _as_result(
        t2_all.filter(F.col("_direct.err").isNotNull()),
        F.lit("direct"), F.lit(0), url, F.lit(""), None, None, F.col("_direct.err"),
    ).select(*passthrough, *RESULT_COLS)
    t2 = t2_all.filter(F.col("_direct.err").isNull())
    direct_useful = (F.col("_direct.status") < 400) & has_useful_signal(F.col("_direct.html"))
    direct_done = _as_result(
        t2.filter(direct_useful),
        F.lit("direct"),
        F.col("_direct.status"),
        F.col("_direct.final_url"),
        F.col("_direct.html"),
    ).select(*passthrough, *RESULT_COLS)

    # --- tier 3: renderer for thin pages
    t3 = t2.filter(~direct_useful).withColumn("_rendered", render_udf(url)).cache()
    render_useful = F.col("_rendered.final_url").isNotNull() & has_useful_signal(
        F.col("_rendered.html")
    )
    render_done = _as_result(
        t3.filter(render_useful),
        F.lit("renderer"),
        F.col("_rendered.status"),
        F.col("_rendered.final_url"),
        F.col("_rendered.html"),
    ).select(*passthrough, *RESULT_COLS)

    # --- tier 4: aggregator unwrap on whatever HTML we hold
    rest = t3.filter(~render_useful)
    best_html = F.coalesce(F.col("_rendered.html"), F.col("_direct.html"), F.lit(""))
    rest = rest.withColumn("_ats_url", first_ats_link(best_html)).cache()
    unwrap_cond = is_aggregator_host(host_from_url(url)) & F.col("_ats_url").isNotNull()
    unwrap_in = rest.filter(unwrap_cond)

    u1 = unwrap_in.withColumn("_api2", api_udf(F.col("_ats_url"))).cache()
    unwrap_api_done = _as_result(
        u1.filter(F.col("_api2.ok") == 1),
        F.col("_api2.provider"),
        F.col("_api2.status"),
        make_canonical(F.col("_api2.final_url")),
        F.lit(""),
        F.col("_api2.api_company"),
        F.col("_api2.api_role"),
    ).select(*passthrough, *RESULT_COLS)

    u2 = (
        u1.filter(F.col("_api2.ok") == 0)
        .withColumn("_d2", http_udf(F.col("_ats_url")))
        .cache()
    )
    d2_useful = (F.col("_d2.status") < 400) & has_useful_signal(F.col("_d2.html"))
    unwrap_direct_done = _as_result(
        u2.filter(d2_useful),
        F.lit("direct-unwrapped"),
        F.col("_d2.status"),
        F.col("_d2.final_url"),
        F.col("_d2.html"),
    ).select(*passthrough, *RESULT_COLS)

    u3 = u2.filter(~d2_useful).withColumn("_r2", render_udf(F.col("_ats_url"))).cache()
    r2_useful = F.col("_r2.final_url").isNotNull() & has_useful_signal(F.col("_r2.html"))
    unwrap_render_done = _as_result(
        u3.filter(r2_useful),
        F.lit("renderer-unwrapped"),
        F.col("_r2.status"),
        F.col("_r2.final_url"),
        F.col("_r2.html"),
    ).select(*passthrough, *RESULT_COLS)

    # --- tier 5: last resort — rendered else direct (:479)
    unwrap_failed = u3.filter(~r2_useful)
    # no_unwrap is the exact null-safe complement of unwrap_cond over
    # `rest` — a filter, NOT an anti-join on the passthrough columns
    # (anti-join equality is null-unsafe: a row with any NULL
    # passthrough value that entered the unwrap branch would survive
    # the anti-join and be emitted twice, duplicating a
    # side-effecting fetch; identical passthrough rows would also
    # collapse). A NULL predicate means the row did NOT enter
    # unwrap_in, so it belongs here.
    no_unwrap = rest.filter(~F.coalesce(unwrap_cond, F.lit(False)))
    last_in = no_unwrap.unionByName(unwrap_failed.select(*no_unwrap.columns))
    rendered_exists = F.col("_rendered.final_url").isNotNull()
    last_done = _as_result(
        last_in,
        F.when(rendered_exists, F.lit("renderer")).otherwise(F.lit("direct")),
        F.when(rendered_exists, F.col("_rendered.status")).otherwise(F.col("_direct.status")),
        F.when(rendered_exists, F.col("_rendered.final_url")).otherwise(F.col("_direct.final_url")),
        F.when(rendered_exists, F.col("_rendered.html")).otherwise(F.col("_direct.html")),
    ).select(*passthrough, *RESULT_COLS)

    out = (
        api_done.unionByName(api_err_done)
        .unionByName(direct_done)
        .unionByName(direct_err_done)
        .unionByName(render_done)
        .unionByName(unwrap_api_done)
        .unionByName(unwrap_direct_done)
        .unionByName(unwrap_render_done)
        .unionByName(last_done)
    )
    # Materialize and truncate lineage: (a) the side-effecting fetch
    # UDFs run exactly once, (b) downstream plans (the decide cascade
    # is a large expression tree) don't embed the 7-branch cascade —
    # without this Catalyst re-optimizes the combined plan for
    # minutes. Fetch batches are bounded (BATCH_SIZE), so local
    # checkpoint storage is small by construction.
    return out.localCheckpoint(eager=True)
