"""Cross-implementation parity: the Spark Column functions vs the
REFERENCE's own JavaScript, executed via node (tools/js_oracle.js
evals the read-only reference sources — no reference code lives in
this repo). This pins our regex/string semantics to the reference's
actual behavior, not to its doc-comments.

Known, documented deviations (excluded from inputs below):
- makeCanonical_: JS URL.toString() re-normalizes the whole URL
  (adds '/' to an empty path, lowercases the host, re-encodes
  percent-escapes). Our engine only strips tracking params — for
  already-normalized URLs (every URL the pipeline canonicalizes
  twice, and all dedup uses) the outputs agree.
- stripEmojis_: JS \\p{Extended_Pictographic} vs our explicit-range
  class (Java 17 lacks the property); agrees on real emoji, may
  differ on unassigned codepoints.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

from joblink_etl_spark.functions import html as H
from joblink_etl_spark.functions import predicates as P
from joblink_etl_spark.functions import text as T
from joblink_etl_spark.functions import url as U

REF = "/root/reference/apps-scripts/code-LLM-intergration.js"
pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not os.path.exists(REF),
    reason="node or reference not available",
)

URLS = [
    "https://boards.greenhouse.io/acme-corp/jobs/12345",
    "https://job-boards.greenhouse.io/mega_corp/jobs/9?gh_jid=9",
    "https://jobs.lever.co/acme/foo-bar-123",
    "https://jobs.ashbyhq.com/openai/55",
    "https://apply.workable.com/acme-inc/j/ABCD123/",
    "https://jobs.smartrecruiters.com/AcmeCorp/743999",
    "https://jobs.jobvite.com/careers/acme/job/oa123",
    "https://ats.rippling.com/acme-jobs/jobs/1",
    "https://acme.wd5.myworkdayjobs.com/en-us/external/job/NYC/Engineer_R123",
    "https://acme.workdayjobs.com/ext/job/x",
    "https://recruiting.paylocity.com/Recruiting/Jobs/Details/123/acme",
    "https://www.linkedin.com/jobs/view/123?utm_source=share",
    "https://www.indeed.com/viewjob?jk=abc&utm_campaign=x",
    "https://careers.example.com/p/1?utm_source=a&utm_medium=b&keep=1#frag",
    "https://x.com/j?src=1&SOURCE=2&codes=3",
    "https://x.com/j?gh_src=1&a=2&utm_term=3#f",
    "https://example.com/path",
    "not a url",
    "",
    "HTTPS://WWW.EXAMPLE.COM/UPPER?source=x",
    "https://builtin.nyc/job/1",
    "https://wellfound.com/jobs/2",
]

TITLES = [
    ("Acme — Senior Software Engineer – Req#8932, CA", "Acme"),
    ("Senior SWE - New York, NY", ""),
    ("Senior Engineer — Acme", "Acme"),
    ("<b>Staff</b> Engineer &amp; Lead", ""),
    ("Engineer Req#12345", ""),
    ("Engineer 99999", ""),
    ("Engineer - Austin, TX", ""),
    ("Acme (US) — Engineer", "Acme (US)"),
    ("🚀 Rocket Engineer ✨", ""),
    ("Job ID: 4242", ""),
    ("Engineer - Remote", ""),
    ("Acme: Platform Engineer", "Acme"),
    ("  spaced   out  role  ", ""),
    ("", "Acme"),
    ("Développeur Sénior — Paris", ""),
    ("Engineer JR 77", ""),
]

HTMLS = [
    '<html><title> A  Title </title><h1 class="x"><span>Staff</span> Eng</h1>'
    '<meta property="og:title" content="OG T"><meta property="og:site_name" content="Acme"></html>',
    "<html><title>Sign in</title></html>",
    '<script type="application/ld+json">{"@type":"JobPosting"}</script>',
    "<h1>ab</h1>",
    "<h1></h1><title></title>",
    "<TITLE>Upper Case</TITLE><H1>Upper H1</H1>",
    '<meta name="description" content="desc">',
    "<style>.x{}</style><script>var a=1;</script><p>body   text</p>",
    "",
    "<h1>Multi\nline\nh1</h1><title>Multi\nline</title>",
]

HOSTS = [
    "jobs.lever.co", "boards.greenhouse.io", "example.com", "linkedin.com",
    "sub.icims.com", "acme.wd5.myworkdayjobs.com", "builtin.sf", "builtin.com",
    "recruiting2.ultipro.com", "paylocity.com", "angel.co", "levels.fyi",
]

GENERIC = [
    "Job details", "JOB DETAIL", "Careers at Acme", "sign in", "ab", "abc",
    "Senior Engineer", "", "  ", "home", "Opportunities await", "join our team!",
]


def js_oracle(tasks: list[dict]):
    proc = subprocess.run(
        ["node", "tools/js_oracle.js"],
        input=json.dumps(tasks).encode(),
        capture_output=True,
        check=True,
    )
    return json.loads(proc.stdout)


def spark_eval(spark, inputs: list, col_fn) -> list:
    df = spark.createDataFrame([(x,) for x in inputs], "v string")
    # preserve input order
    return [
        r["out"]
        for r in df.withColumn("out", col_fn(F.col("v"))).collect()
    ]


def test_url_functions_parity(spark):
    js = js_oracle(
        [{"fn": "hostFromUrl_", "args": [u]} for u in URLS]
        + [{"fn": "guessCompanyFromUrl_", "args": [u]} for u in URLS]
        + [{"fn": "isAtsHost_", "args": [h]} for h in HOSTS]
        + [{"fn": "isAggregatorHost_", "args": [h]} for h in HOSTS]
    )
    n = len(URLS)
    got_host = spark_eval(spark, URLS, U.host_from_url)
    got_guess = spark_eval(spark, URLS, U.guess_company_from_url)
    got_ats = spark_eval(spark, HOSTS, P.is_ats_host)
    got_agg = spark_eval(spark, HOSTS, P.is_aggregator_host)
    assert got_host == js[:n]
    assert got_guess == js[n : 2 * n]
    assert got_ats == js[2 * n : 2 * n + len(HOSTS)]
    assert got_agg == js[2 * n + len(HOSTS) :]


def test_canonical_parity_on_normalized_urls(spark):
    # exclude the known-deviation shapes: non-URL inputs (JS returns
    # them verbatim, as do we) are fine; URLs with empty paths or
    # uppercase hosts normalize differently — all pipeline inputs are
    # canonicalized from real hrefs which carry a path.
    urls = [u for u in URLS if u.startswith("https://") and "/" in u.split("//", 1)[1]]
    js = js_oracle([{"fn": "makeCanonical_", "args": [u]} for u in urls])
    got = spark_eval(spark, urls, U.make_canonical)
    assert got == js


def test_clean_role_parity(spark):
    js = js_oracle([{"fn": "cleanRole_", "args": [t, c]} for t, c in TITLES])
    df = spark.createDataFrame(TITLES, "t string, c string")
    got = [
        r["out"]
        for r in df.withColumn("out", T.clean_role(F.col("t"), F.col("c"))).collect()
    ]
    assert got == js


def test_html_extractor_parity(spark):
    js = js_oracle(
        [{"fn": "getTitle_", "args": [h]} for h in HTMLS]
        + [{"fn": "getH1_", "args": [h]} for h in HTMLS]
        + [{"fn": "getMeta_", "args": [h, "og:title", "property"]} for h in HTMLS]
        + [{"fn": "textPreview_", "args": [h, 50]} for h in HTMLS]
        + [{"fn": "hasUsefulSignal_", "args": [h]} for h in HTMLS]
    )
    n = len(HTMLS)
    assert spark_eval(spark, HTMLS, H.get_title) == js[:n]
    assert spark_eval(spark, HTMLS, H.get_h1) == js[n : 2 * n]
    assert (
        spark_eval(spark, HTMLS, lambda c: H.get_meta(c, "og:title", "property"))
        == js[2 * n : 3 * n]
    )
    assert spark_eval(spark, HTMLS, lambda c: H.text_preview(c, 50)) == js[3 * n : 4 * n]
    # the JS returns falsy '' (short-circuit residue) where we return
    # False — truthiness is the contract, so coerce
    assert spark_eval(spark, HTMLS, H.has_useful_signal) == [bool(x) for x in js[4 * n :]]


def test_text_functions_parity(spark):
    strings = [
        "A &amp; B &lt;x&gt; &quot;q&quot; &#39;a&apos; &AMP; c",
        "🚀 Engineer ✨ 👍",
        "plain",
        "héllo 世界 ☎️",
        "",
    ]
    js = js_oracle(
        [{"fn": "decodeHtml_", "args": [s]} for s in strings]
        + [{"fn": "stripEmojis_", "args": [s]} for s in strings]
        + [{"fn": "isGenericTitle_", "args": [s]} for s in GENERIC]
        + [{"fn": "niceCase_", "args": [s]} for s in ["acme-corp", "a_b-c", "x", ""]]
    )
    n = len(strings)
    assert spark_eval(spark, strings, T.decode_html) == js[:n]
    assert spark_eval(spark, strings, T.strip_emojis) == js[n : 2 * n]
    assert spark_eval(spark, GENERIC, P.is_generic_title) == js[2 * n : 2 * n + len(GENERIC)]
    assert (
        spark_eval(spark, ["acme-corp", "a_b-c", "x", ""], U.nice_case)
        == js[2 * n + len(GENERIC) :]
    )
