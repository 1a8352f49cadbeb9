"""Debug helpers — the reference's manual smoke entry points
(code-LLM-intergration.js:1199-1214, "Debug helpers" section) as
plain functions a notebook/REPL user calls while wiring clients.

These are OPERATOR-free conveniences: no registry entry, no oracle
(the reference's versions just Logger.log a dict). They exist so a
user of the reference who relied on `debugRenderer()` /
`debugNotesOnce()` has the same one-call sanity checks here.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def debug_renderer(renderer_client, url: str = "https://example.org/html") -> dict:
    """Renderer wiring sanity check (reference debugRenderer(),
    :1203-1209): one render call, summarized as the same dict shape
    the reference logs — {ok, status, final, first200}. Works with
    any client exposing `render(url) -> (status, final_url, html) |
    None` (clients/fakes.FakeRendererClient in tests; a real HTTP
    client in production)."""
    r = renderer_client.render(url)
    if r is None:
        return {"ok": False, "status": None, "final": None, "first200": None}
    status, final_url, html = r
    return {
        "ok": True,
        "status": status,
        "final": final_url,
        "first200": (html or "")[:200],
    }


def debug_notes_once(
    spark: SparkSession,
    tracker: DataFrame,
    profile: dict[str, str],
    limit: int = 1,
) -> list[dict[str, Any]]:
    """One SMALL notes batch (reference debugNotesOnce(), :1212-1214
    — processNotesBatch(true) with the test flag): run the
    template-notes pipeline over the first `limit` rows that
    actually need notes and return the rendered rows as dicts for
    eyeballing. Bounded by construction (limit ≤ a handful), so the
    collect is the point, not an anti-pattern."""
    from .operators.notes import apply_notes, needs_notes
    from pyspark.sql import functions as F

    pending = tracker.filter(
        needs_notes(F.col("li_invite"), F.col("li_followup"))
    ).limit(limit)
    out = apply_notes(pending, profile)
    return [row.asDict() for row in out.collect()]
