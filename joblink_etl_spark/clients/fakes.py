"""Deterministic fake clients for the external-service boundary
(SURVEY.md §2.11 U1-U5): HTTP fetcher, Playwright-renderer, and LLM
chat-completions. Real deployments swap in urllib/requests-backed
implementations with the same duck-typed interface; tests and the
driver's rows-only checks use these fakes, which synthesize
responses purely from the URL/prompt — picklable, executor-safe,
no network.

URL grammar the synthetic site understands:
  https://boards.greenhouse.io/<slug>/jobs/<id>     ATS API-able
  https://jobs.lever.co/<slug>/<id>                 ATS API-able
  https://site<i>.example.com/direct/<id>           rich direct page
  https://site<i>.example.com/thin/<id>             thin direct, rich rendered
  https://site<i>.example.com/broken/<id>           HTTP 500 everywhere
  https://www.linkedin.com/jobs/view/<id>           aggregator wrapping a
                                                    greenhouse link
"""

from __future__ import annotations

import json
import re


def _job_id(url: str) -> str:
    nums = re.findall(r"\d+", url)
    return nums[-1] if nums else "0"


class SyntheticSiteHttpClient:
    """Fake of the direct fetcher + ATS APIs (reference directFetch_
    :339-346 and fetchViaAtsApis_ :361-389)."""

    def fetch(self, url: str) -> tuple[int, str, str]:
        jid = _job_id(url)
        if "boards-api.greenhouse.io" in url:
            return (200, url, json.dumps({"title": f"Platform Engineer {jid}"}))
        if "api.lever.co" in url:
            return (200, url, json.dumps({"text": f"Data Engineer {jid}"}))
        if "/broken/" in url:
            return (500, url, "Internal Server Error")
        if "/direct/" in url:
            return (
                200,
                url,
                f"<html><h1>Staff Analyst {jid}</h1>"
                f'<meta property="og:site_name" content="Site {jid}"></html>',
            )
        if "/thin/" in url:
            return (200, url, "<html><div id='root'></div></html>")
        if "linkedin.com/jobs/view" in url:
            return (
                200,
                url,
                "<html><title>Sign in</title>"
                f'<a href="https://boards.greenhouse.io/wrapped-co/jobs/{jid}">Apply</a></html>',
            )
        if "greenhouse.io" in url or "lever.co" in url:
            return (200, url, f"<html><h1>Fallback Page {jid}</h1></html>")
        return (404, url, "")


class ThrowingHttpClient(SyntheticSiteHttpClient):
    """Raises for /raise/ URLs — exercises the ST5 dead-letter path
    (reference error catch :915-918). Defined here (not in a test
    module) so the UDF closure unpickles on executors."""

    def fetch(self, url: str) -> tuple[int, str, str]:
        if "/raise/" in url:
            raise RuntimeError("connection refused")
        return super().fetch(url)


class FakeRendererClient:
    """Fake of the Playwright renderer service (reference
    cloud-renderer/server.js:11-58 + fetchViaRenderer_ :398-414).
    Renders rich HTML for /thin/ pages, passes others through the
    HTTP fake, returns None for /broken/ (renderer error)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._http = SyntheticSiteHttpClient()

    def render(self, url: str) -> tuple[int, str, str] | None:
        if not self.enabled:
            return None
        jid = _job_id(url)
        if "/broken/" in url:
            return None
        if "/thin/" in url:
            return (
                200,
                url,
                f"<html><h1>Rendered Analyst {jid}</h1>"
                f'<meta property="og:site_name" content="Thin Co {jid}"></html>',
            )
        return self._http.fetch(url)


class FakeLlmClient:
    """Fake of the chat-completions extractor/notes clients
    (reference llmExtractCompanyRole_ :629-676, llmNotes_
    :1009-1052). Deterministic strict-JSON replies derived from the
    snippet; raises on prompts containing 'FAIL-LLM' so error paths
    are testable."""

    def extract(self, snippet: dict) -> str:
        if "FAIL-LLM" in json.dumps(snippet):
            raise RuntimeError("llm unavailable")
        seed = _job_id(snippet.get("url", ""))
        return json.dumps({"company": f"LLM Co {seed}", "role": f"LLM Role {seed}"})

    def notes(self, snippet: dict) -> str:
        if "FAIL-LLM" in json.dumps(snippet):
            raise RuntimeError("llm unavailable")
        comp = snippet.get("company") or "your company"
        role = snippet.get("role") or "this role"
        return json.dumps(
            {
                "invite": f"Hi! I applied for {role} at {comp} — would love to connect.",
                "followup": (
                    f"Thanks for connecting! I recently applied for {role} at {comp} "
                    "and would enjoy sharing how my background maps to the team's work. "
                    "Happy to keep it to a quick 10-minute chat."
                ),
                "meta": "llm",
            }
        )
