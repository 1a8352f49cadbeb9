"""Golden unit tests for the scalar function library (SURVEY.md §2.7,
FIXTURES.md §5 — pairs derived from the reference's own doc-comments).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from joblink_etl_spark.functions import html as H
from joblink_etl_spark.functions import jsonld as J
from joblink_etl_spark.functions import predicates as P
from joblink_etl_spark.functions import provenance as PR
from joblink_etl_spark.functions import text as T
from joblink_etl_spark.functions import url as U


def one(spark, col, **kwargs):
    """Evaluate a Column expression over a single synthetic row."""
    df = spark.createDataFrame([kwargs or {"dummy": "x"}])
    return df.select(col.alias("out")).first()["out"]


# ---------- F1 host_from_url ----------
@pytest.mark.parametrize(
    "u,expected",
    [
        ("https://www.linkedin.com/jobs/view/123", "linkedin.com"),
        ("https://boards.greenhouse.io/acme/jobs/1", "boards.greenhouse.io"),
        ("http://WWW.Example.COM/x", "example.com"),
        ("not a url", ""),
        ("", ""),
    ],
)
def test_host_from_url(spark, u, expected):
    assert one(spark, U.host_from_url(F.col("u")), u=u) == expected


# ---------- F2 make_canonical ----------
@pytest.mark.parametrize(
    "u,expected",
    [
        (
            "https://boards.greenhouse.io/acme/jobs/1?gh_src=abc&utm_source=li&ref=keep",
            "https://boards.greenhouse.io/acme/jobs/1?ref=keep",
        ),
        (
            "https://x.com/j?utm_source=a&utm_medium=b&utm_campaign=c&utm_term=d&utm_content=e",
            "https://x.com/j",
        ),
        ("https://x.com/j?src=1&source=2&codes=3&gh_jid=4", "https://x.com/j"),
        ("https://x.com/j?vq_campaign=1&vq_source=2&__jvst=3&__jvsd=4", "https://x.com/j"),
        ("https://x.com/j?keep=1#frag", "https://x.com/j?keep=1#frag"),
        ("https://x.com/j?gh_src=1#frag", "https://x.com/j#frag"),
        ("https://x.com/plain", "https://x.com/plain"),
        # deletion is case-sensitive, like JS URLSearchParams.delete
        ("https://x.com/j?UTM_SOURCE=a", "https://x.com/j?UTM_SOURCE=a"),
    ],
)
def test_make_canonical(spark, u, expected):
    assert one(spark, U.make_canonical(F.col("u")), u=u) == expected


def test_make_canonical_idempotent(spark):
    u = "https://x.com/j?gh_src=1&a=2&utm_term=3#f"
    once = one(spark, U.make_canonical(F.col("u")), u=u)
    twice = one(spark, U.make_canonical(F.lit(once)))
    assert once == twice == "https://x.com/j?a=2#f"


# ---------- F8 nice_case / F9 guess_company_from_url ----------
@pytest.mark.parametrize(
    "slug,expected",
    [("acme-corp", "Acme Corp"), ("acme_corp", "Acme Corp"), ("acme", "Acme")],
)
def test_nice_case(spark, slug, expected):
    assert one(spark, U.nice_case(F.col("s")), s=slug) == expected


@pytest.mark.parametrize(
    "u,expected",
    [
        ("https://jobs.lever.co/acme/foo", "Acme"),
        ("https://boards.greenhouse.io/megacorp/jobs/12345", "Megacorp"),
        ("https://job-boards.greenhouse.io/mega-corp/jobs/1", "Mega Corp"),
        ("https://jobs.ashbyhq.com/openai/123", "Openai"),
        ("https://apply.workable.com/acme-inc/j/1", "Acme Inc"),
        ("https://jobs.smartrecruiters.com/AcmeCorp/999", "Acmecorp"),
        ("https://jobs.jobvite.com/acme/job/1", "Acme"),
        ("https://ats.rippling.com/acme/jobs/1", "Acme"),
        ("https://acme.wd5.myworkdayjobs.com/en-us/acmecareers/job/x", "Acmecareers"),
        ("https://example.com/careers/1", ""),
        # aggregators are not ATS slugs
        ("https://www.linkedin.com/jobs/view/123", ""),
    ],
)
def test_guess_company_from_url(spark, u, expected):
    assert one(spark, U.guess_company_from_url(F.col("u")), u=u) == expected


# ---------- F3/F4/F5 html extractors ----------
HTML = """
<html><head>
<title>  Acme —  Senior
  Engineer </title>
<meta property="og:title" content="OG Role Title">
<meta property="og:site_name" content='Acme Inc'>
<meta name="description" content="desc here">
</head><body>
<h1 class="x"><span>Staff</span> Engineer</h1>
</body></html>
"""


def test_get_title_collapses_ws(spark):
    assert one(spark, H.get_title(F.col("h")), h=HTML) == "Acme — Senior Engineer"


def test_get_meta_property_and_name(spark):
    assert one(spark, H.get_meta(F.col("h"), "og:title"), h=HTML) == "OG Role Title"
    assert one(spark, H.get_meta(F.col("h"), "og:site_name"), h=HTML) == "Acme Inc"
    assert one(spark, H.get_meta(F.col("h"), "description", "name"), h=HTML) == "desc here"
    assert one(spark, H.get_meta(F.col("h"), "missing"), h=HTML) == ""


def test_get_h1_strips_inner_tags(spark):
    assert one(spark, H.get_h1(F.col("h")), h=HTML) == "Staff Engineer"


def test_text_preview(spark):
    page = "<script>var x=1;</script><style>.a{}</style><p>Hello   <b>world</b></p>"
    assert one(spark, H.text_preview(F.col("h"), 1200), h=page) == "Hello world"
    assert one(spark, H.text_preview(F.col("h"), 3), h=page) == "Hel"


# ---------- P3-P6 predicates ----------
def test_host_predicates(spark):
    assert one(spark, P.is_ats_host(F.col("h")), h="jobs.lever.co")
    assert one(spark, P.is_ats_host(F.col("h")), h="boards.greenhouse.io")
    assert not one(spark, P.is_ats_host(F.col("h")), h="example.com")
    assert one(spark, P.is_aggregator_host(F.col("h")), h="linkedin.com")
    assert one(spark, P.is_aggregator_host(F.col("h")), h="builtin.nyc")
    assert not one(spark, P.is_aggregator_host(F.col("h")), h="acme.com")


@pytest.mark.parametrize(
    "t,generic",
    [
        ("Job details", True),
        ("Sign in", True),
        ("  ", True),
        ("ab", True),
        ("Senior Software Engineer", False),
        ("Careers at Acme", True),  # 'careers' substring
    ],
)
def test_is_generic_title(spark, t, generic):
    assert one(spark, P.is_generic_title(F.col("t")), t=t) == generic


def test_has_useful_signal(spark):
    jsonld_page = '<script type="application/ld+json">{}</script>'
    assert one(spark, H.has_useful_signal(F.col("h")), h=jsonld_page)
    assert one(spark, H.has_useful_signal(F.col("h")), h="<h1>Staff Engineer</h1>")
    assert not one(spark, H.has_useful_signal(F.col("h")), h="<h1>Sign in</h1>")
    assert not one(spark, H.has_useful_signal(F.col("h")), h="")
    assert not one(spark, H.has_useful_signal(F.col("h")), h="<p>nothing</p>")


# ---------- F10-F12 text ----------
def test_strip_emojis(spark):
    assert one(spark, T.strip_emojis(F.col("s")), s="🚀 Engineer ✨") == " Engineer "
    assert one(spark, T.strip_emojis(F.col("s")), s="héllo 世界") == "héllo 世界"


def test_decode_html(spark):
    assert (
        one(spark, T.decode_html(F.col("s")), s="A &amp; B &lt;x&gt; &quot;q&quot; &#39;a&apos;")
        == "A & B <x> \"q\" 'a'"
    )


@pytest.mark.parametrize(
    "title,company,expected",
    [
        # Ground truth from running the reference's cleanRole_ in node
        # (the reference's own doc-comment examples at :589-590 do NOT
        # match its implementation — e.g. the ', CA' tail survives
        # because the Req regex requires \s*$ right after the digits;
        # we reproduce the implementation, not the comment).
        (
            "Acme — Senior Software Engineer – Req#8932, CA",
            "Acme",
            "Senior Software Engineer – Req#8932, CA",
        ),
        ("Senior SWE - New York, NY", None, "Senior SWE - New York, NY"),
        ("Senior Engineer — Acme", "Acme", "Senior Engineer"),
        ("<b>Staff</b> Engineer", None, "Staff Engineer"),
        ("Engineer Req#12345", None, "Engineer"),
        # the (?i) 'R' alternative eats the trailing 'r' — verified JS behavior
        ("Engineer 99999", None, "Enginee"),
        ("Engineer - Austin, TX", None, "Engineer"),
        ("Acme (US) — Engineer", "Acme (US)", "Engineer"),  # regex-escaped company
        ("", "Acme", ""),
    ],
)
def test_clean_role(spark, title, company, expected):
    comp = F.lit(company) if company is not None else None
    assert one(spark, T.clean_role(F.col("t"), comp), t=title) == expected


# ---------- F17/F18 provenance ----------
def test_render_token(spark):
    tok = PR.render_token(
        "parse",
        {"provider": F.lit("direct"), "signals": F.lit("h1"), "conf": F.lit("0.35")},
    )
    assert one(spark, tok) == "parse:{provider=direct, signals=h1, conf=0.35}"


def test_append_source_token_appends_and_replaces(spark):
    # fresh
    out = one(
        spark,
        PR.append_source_token(F.lit(""), "parse", {"conf": F.lit("0.5")}),
    )
    assert out == "parse:{conf=0.5}"
    # append new kind
    out2 = one(
        spark,
        PR.append_source_token(F.lit(out), "notes", {"mode": F.lit("template")}),
    )
    assert out2 == "parse:{conf=0.5} | notes:{mode=template}"
    # replace same kind in place
    out3 = one(
        spark,
        PR.append_source_token(F.lit(out2), "parse", {"conf": F.lit("0.9")}),
    )
    assert out3 == "parse:{conf=0.9} | notes:{mode=template}"


def test_format_conf(spark):
    assert one(spark, T.format_conf(F.lit(0.9))) == "0.90"
    assert one(spark, T.format_conf(F.lit(0.85))) == "0.85"
    assert one(spark, T.format_conf(F.lit(1.0))) == "1.00"


# ---------- F6/F7 jsonld (pure python core + UDF) ----------
def test_extract_job_posting_simple():
    h = (
        '<script type="application/ld+json">'
        '{"@type":"JobPosting","title":"SWE","hiringOrganization":{"name":"Acme"}}'
        "</script>"
    )
    assert J.extract_job_posting(h) == ("Acme", "SWE")


def test_extract_job_posting_graph_and_array_type():
    h = (
        '<script type="application/ld+json">'
        '{"@graph":[{"@type":["Thing","JobPosting"],"title":"PM",'
        '"hiringOrganization":"MegaCorp"}]}'
        "</script>"
    )
    assert J.extract_job_posting(h) == ("MegaCorp", "PM")


def test_extract_job_posting_skips_bad_json_blocks():
    h = (
        '<script type="application/ld+json">{not json}</script>'
        '<script type="application/ld+json">'
        '{"a":{"b":{"@type":"jobPosting","title":"Deep"}}}</script>'
    )
    assert J.extract_job_posting(h) == ("", "Deep")


def test_extract_job_posting_none():
    assert J.extract_job_posting("<p>no scripts</p>") == ("", "")
    assert J.extract_job_posting("") == ("", "")


def test_jsonld_udf(spark):
    h = (
        '<script type="application/ld+json">'
        '{"@type":"JobPosting","title":"SWE","hiringOrganization":{"name":"Acme"}}'
        "</script>"
    )
    df = spark.createDataFrame([{"html": h}, {"html": "<p>x</p>"}])
    rows = (
        df.select(J.jsonld_job_posting(F.col("html")).alias("jp"))
        .select("jp.company", "jp.role")
        .collect()
    )
    got = sorted([(r["company"], r["role"]) for r in rows])
    assert got == [("", ""), ("Acme", "SWE")]


def test_udtf_extracts_every_posting_with_provenance(spark):
    from joblink_etl_spark.functions.jsonld import make_postings_udtf

    spark.udtf.register("extract_postings_t", make_postings_udtf())
    page = (
        '<script type="application/ld+json">{"@type":"JobPosting","title":"Eng",'
        '"hiringOrganization":{"name":"Acme"}}</script>'
        '<p>noise</p>'
        '<script type="application/ld+json">{"not":"json"'  # malformed, skipped
        '</script>'
        '<script type="application/ld+json">{"@graph":[{"@type":"JobPosting",'
        '"title":"PM","hiringOrganization":"Globex"}]}</script>'
    )
    spark.createDataFrame(
        [(1, page), (2, "<p>none</p>"), (3, None)], ["id", "html"]
    ).createOrReplaceTempView("pages_t")
    rows = sorted(
        map(tuple, spark.sql(
            "SELECT id, p.block_index, p.company, p.role "
            "FROM pages_t, LATERAL extract_postings_t(html) p"
        ).collect())
    )
    assert rows == [(1, 0, "Acme", "Eng"), (1, 2, "Globex", "PM")]


def test_geo_mean_udaf_grouped(spark):
    import math

    from joblink_etl_spark.operators.sketches import make_geo_mean_udaf

    geo = make_geo_mean_udaf()
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 4.0), ("b", 0.0)], ["k", "v"]
    )
    got = {r.k: r.g for r in df.groupBy("k").agg(geo("v").alias("g")).collect()}
    assert abs(got["a"] - 10.0) < 1e-9  # sqrt(1*100)
    assert abs(got["b"] - 4.0) < 1e-9  # zeros excluded
