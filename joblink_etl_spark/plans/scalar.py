"""Oracle-checkable plans exercising the scalar function library
(SURVEY.md §2.7) over deterministic URL/title columns synthesized
from the driver tables.

Each query synthesizes its input with IDENTICAL expressions in the
Spark plan and the DuckDB oracle, then applies the engine's Column
functions on the Spark side and hand-written equivalent SQL on the
DuckDB side — so the oracle genuinely cross-checks the function
implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import predicates as P
from ..functions import provenance as PR
from ..functions import text as T
from ..functions import url as U
from ..sources import table

# ---------------------------------------------------------------------------
# url_functions: F1 host, F2 canonicalize, F8/F9 company-from-slug,
# P1/P3/P4 predicates — over 6 URL shapes keyed by c_custkey % 6.
# ---------------------------------------------------------------------------


def _synth_url(ck):
    s = ck.cast("string")
    return (
        F.when(ck % 6 == 0, F.concat(F.lit("https://boards.greenhouse.io/acme-corp/jobs/"), s, F.lit("?utm_source=li&gh_jid="), s, F.lit("&ref=keep")))
        .when(ck % 6 == 1, F.concat(F.lit("https://jobs.lever.co/mega-corp/"), s, F.lit("?gh_src=newsletter")))
        .when(ck % 6 == 2, F.concat(F.lit("https://www.linkedin.com/jobs/view/"), s, F.lit("?utm_campaign=x&trk=keepme")))
        .when(ck % 6 == 3, F.concat(F.lit("https://careers.example.com/p/"), s, F.lit("#apply")))
        .when(ck % 6 == 4, F.concat(F.lit("not-a-url-"), s))
        .otherwise(F.concat(F.lit("https://apply.workable.com/widget-co/j/"), s, F.lit("/?src=promo")))
    )


def url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    url = _synth_url(ck)
    host = U.host_from_url(url)
    return cust.select(
        ck.alias("c_custkey"),
        url.alias("url"),
        host.alias("host"),
        U.make_canonical(url).alias("canonical"),
        U.guess_company_from_url(url).alias("company_guess"),
        P.is_ats_host(host).alias("is_ats"),
        P.is_aggregator_host(host).alias("is_agg"),
        P.is_valid_url(url).alias("is_valid"),
    )


_SYNTH_URL_SQL = """
CASE c_custkey % 6
  WHEN 0 THEN 'https://boards.greenhouse.io/acme-corp/jobs/' || c_custkey::VARCHAR || '?utm_source=li&gh_jid=' || c_custkey::VARCHAR || '&ref=keep'
  WHEN 1 THEN 'https://jobs.lever.co/mega-corp/' || c_custkey::VARCHAR || '?gh_src=newsletter'
  WHEN 2 THEN 'https://www.linkedin.com/jobs/view/' || c_custkey::VARCHAR || '?utm_campaign=x&trk=keepme'
  WHEN 3 THEN 'https://careers.example.com/p/' || c_custkey::VARCHAR || '#apply'
  WHEN 4 THEN 'not-a-url-' || c_custkey::VARCHAR
  ELSE 'https://apply.workable.com/widget-co/j/' || c_custkey::VARCHAR || '/?src=promo'
END
"""

_TRACKING_LIST_SQL = "[" + ", ".join(f"'{p}'" for p in U.TRACKING_PARAMS) + "]"

# DuckDB spelling of nice_case (no initcap function there)
_NICE_SQL = (
    "array_to_string(list_transform(string_split(trim(regexp_replace(regexp_replace({s},"
    " '[-_]+', ' ', 'g'), '\\s+', ' ', 'g')), ' '), w -> upper(w[1]) || lower(w[2:])), ' ')"
)

_SLUG_SQL = (
    "coalesce("
    + ", ".join(
        f"nullif(regexp_extract(lower(url), '{p}', 1), '')"
        for p in U.ATS_SLUG_PATTERNS
    )
    + ", '')"
)

URL_FUNCTIONS_SQL = f"""
WITH synth AS (
  SELECT c_custkey, {_SYNTH_URL_SQL} AS url FROM customer
), parts AS (
  SELECT c_custkey, url,
         regexp_replace(lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)), '^www\\.', '') AS host,
         regexp_extract(url, '^([^?#]*)', 1) AS base,
         regexp_extract(url, '\\?([^#]*)', 1) AS query,
         regexp_extract(url, '(#.*)$', 1) AS frag,
         {_SLUG_SQL} AS slug
  FROM synth
)
SELECT c_custkey, url, host,
       base || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END || frag AS canonical,
       {_NICE_SQL.format(s="slug")} AS company_guess,
       regexp_matches(host, '{P.ATS_HOST_RE}') AS is_ats,
       regexp_matches(host, '{P.AGGREGATOR_HOST_RE}') AS is_agg,
       regexp_matches(url, '^https?://') AS is_valid
FROM (
  SELECT *, array_to_string(list_filter(string_split(query, '&'),
            p -> p <> '' AND NOT list_contains({_TRACKING_LIST_SQL}, split_part(p, '=', 1))), '&') AS qs
  FROM parts
)
"""

# ---------------------------------------------------------------------------
# clean_role_pipeline: F10-F13 text cleanup over 5 title shapes from part.
# ---------------------------------------------------------------------------


def _synth_title(pk, name):
    s = pk.cast("string")
    return (
        F.when(pk % 5 == 0, F.concat(F.lit("Acme — "), name, F.lit(" – Req#"), s))
        .when(pk % 5 == 1, F.concat(F.lit("<b>"), name, F.lit("</b> Req#"), s))
        .when(pk % 5 == 2, F.concat(name, F.lit(" - Austin, TX")))
        .when(pk % 5 == 3, F.concat(name, F.lit(" 🚀 — Acme")))
        .otherwise(F.concat(name, F.lit(" &amp; co")))
    )


def clean_role_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    title = _synth_title(pk, F.col("p_name"))
    return part.select(
        pk.alias("p_partkey"),
        title.alias("raw_title"),
        T.clean_role(title, F.lit("Acme")).alias("clean_title"),
    )


# RE2 spelling of the emoji class (same ranges as functions/text.py)
_EMOJI_RE2 = T.EMOJI_CLASS

CLEAN_ROLE_PIPELINE_SQL = f"""
WITH synth AS (
  SELECT p_partkey,
    CASE p_partkey % 5
      WHEN 0 THEN 'Acme — ' || p_name || ' – Req#' || p_partkey::VARCHAR
      WHEN 1 THEN '<b>' || p_name || '</b> Req#' || p_partkey::VARCHAR
      WHEN 2 THEN p_name || ' - Austin, TX'
      WHEN 3 THEN p_name || ' 🚀 — Acme'
      ELSE p_name || ' &amp; co'
    END AS raw_title
  FROM part
), cleaned AS (
  SELECT p_partkey, raw_title,
    regexp_replace(regexp_replace(
      regexp_replace(raw_title, '<[^>]*>', '', 'g')
        .regexp_replace('&amp;', '&', 'gi').regexp_replace('&lt;', '<', 'gi')
        .regexp_replace('&gt;', '>', 'gi').regexp_replace('&quot;', '"', 'gi')
        .regexp_replace('&#39;|&apos;', '''', 'gi')
        .regexp_replace('{_EMOJI_RE2}', '', 'g')
        .regexp_replace('(?i)^\\s*Acme\\s*[-–—:]*\\s*', '')
        .regexp_replace('(?i)\\s*[-–—:]*\\s*Acme\\s*$', ''),
      '\\s*-\\s*[A-Z][a-z]+(,?\\s*[A-Z]{{2}})?$', ''),
      '(?i)\\s*[-–—]?\\s*((JR|Req|R|ID|Job)[\\s#:]*\\d+|\\d{{5,}})\\s*$', '') AS r
  FROM synth
)
SELECT p_partkey, raw_title, trim(regexp_replace(r, '\\s+', ' ', 'g')) AS clean_title
FROM cleaned
"""

# ---------------------------------------------------------------------------
# provenance_tokens: F17/F18 source-token replace-by-kind over orders.
# ---------------------------------------------------------------------------


def provenance_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    prev = (
        F.when(ok % 3 == 0, F.lit(""))
        .when(ok % 3 == 1, F.lit("parse:{provider=x, conf=0.10}"))
        .otherwise(F.lit("fetch:{escalated=renderer} | parse:{conf=0.10}"))
    )
    conf = (ok % 2 + 1).cast("double") * 0.35
    tok_kv = {
        "provider": F.lit("direct"),
        "signals": F.lit("h1"),
        "conf": T.format_conf(conf),
    }
    return orders.select(
        ok.alias("o_orderkey"),
        prev.alias("prev_source"),
        PR.append_source_token(prev, "parse", tok_kv).alias("new_source"),
    )


PROVENANCE_TOKENS_SQL = """
SELECT o_orderkey,
  CASE o_orderkey % 3
    WHEN 0 THEN ''
    WHEN 1 THEN 'parse:{provider=x, conf=0.10}'
    ELSE 'fetch:{escalated=renderer} | parse:{conf=0.10}'
  END AS prev_source,
  CASE o_orderkey % 3
    WHEN 0 THEN tok
    WHEN 1 THEN tok
    ELSE 'fetch:{escalated=renderer} | ' || tok
  END AS new_source
FROM (
  SELECT o_orderkey,
         'parse:{provider=direct, signals=h1, conf=' ||
         printf('%.2f', (o_orderkey % 2 + 1) * 0.35) || '}' AS tok
  FROM orders
)
"""


# ---------------------------------------------------------------------------
# scalar_functions_v2: consolidated driver face for the scalar
# functions that previously rode on pytest + JS-parity only
# (VERDICT r7 item 7) — F10 stripEmojis_ (explicit
# Extended-Pictographic ranges incl. the SMP emoji planes, reference
# code-LLM-intergration.js:569-577), F20 toFixed(2)
# (functions/text.py::format_conf, reference :846), F19 truncation
# guards (functions/text.py::truncate). Six title shapes keyed by
# p_partkey % 6 plant emojis from every EP subrange the class
# enumerates; conf values are 2-decimal (never a binary formatting
# midpoint, so Java format_string and C printf agree digit-exactly).
# ---------------------------------------------------------------------------


def _synth_emoji_title(pk, name):
    return (
        F.when(pk % 6 == 0, F.concat(name, F.lit(" \U0001F600\U0001F680")))
        .when(pk % 6 == 1, F.concat(F.lit("☎ "), name, F.lit(" ™")))
        .when(pk % 6 == 2, F.concat(name, F.lit(" (c) ©®")))
        .when(pk % 6 == 3, F.concat(F.lit("plain "), name))
        .when(pk % 6 == 4, F.concat(name, F.lit(" ⭐️")))
        .otherwise(F.concat(F.lit("❗"), name, F.lit("❗")))
    )


def scalar_functions_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    title = _synth_emoji_title(pk, F.col("p_name"))
    clean = T.strip_emojis(title)
    conf = (pk % 101).cast("double") / 100.0
    return part.select(
        pk.alias("p_partkey"),
        title.alias("title"),
        clean.alias("clean_title"),
        (F.length(title) - F.length(clean)).cast("bigint").alias("n_stripped"),
        T.format_conf(conf).alias("conf_str"),
        T.truncate(clean, 20).alias("preview"),
    )


_SYNTH_EMOJI_SQL = """
CASE p_partkey % 6
  WHEN 0 THEN p_name || ' \U0001F600\U0001F680'
  WHEN 1 THEN '☎ ' || p_name || ' ™'
  WHEN 2 THEN p_name || ' (c) ©®'
  WHEN 3 THEN 'plain ' || p_name
  WHEN 4 THEN p_name || ' ⭐️'
  ELSE '❗' || p_name || '❗'
END
"""

SCALAR_FUNCTIONS_V2_SQL = f"""
WITH synth AS (
  SELECT p_partkey, {_SYNTH_EMOJI_SQL} AS title FROM part
), cleaned AS (
  SELECT p_partkey, title,
         regexp_replace(title, '{T.EMOJI_CLASS}', '', 'g') AS clean_title
  FROM synth
)
SELECT p_partkey, title, clean_title,
       (length(title) - length(clean_title))::BIGINT AS n_stripped,
       printf('%.2f', (p_partkey % 101) / 100.0) AS conf_str,
       substr(clean_title, 1, 20) AS preview
FROM cleaned
"""
