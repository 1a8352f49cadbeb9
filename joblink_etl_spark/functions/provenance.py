"""Source-token algebra (reference F17/F18, appendSourceToken_,
code-LLM-intergration.js:791-812).

Tokens look like ``kind:{k=v, k2=v2}``; appending a token of a kind
that already exists replaces it in place, otherwise it is appended
with ``' | '``. Pure Column expressions.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F


def render_token(kind: str, kv: dict[str, Column]) -> Column:
    """``kind:{k=v, ...}`` pretty-printer (reference :801-803).
    Keys are static; values are Columns (cast to string)."""
    parts = [F.concat(F.lit(f"{k}="), v.cast("string")) for k, v in kv.items()]
    return F.concat(F.lit(kind + ":{"), F.concat_ws(", ", *parts), F.lit("}"))


def append_rendered_token(prev: Column, kind: str, tok: Column) -> Column:
    """Replace-by-kind else append, given an already-rendered token
    Column (reference :805-810)."""
    prev = F.trim(F.coalesce(prev, F.lit("")))
    pat = _re.escape(kind) + r":\{[^}]*\}"
    # regexp_replace treats \ and $ specially in the replacement —
    # escape them so token VALUES pass through verbatim.
    tok_as_replacement = F.regexp_replace(tok, r"([\\$])", r"\\$1")
    return (
        F.when(prev.rlike(pat), F.regexp_replace(prev, F.lit(pat), tok_as_replacement))
        .when(prev != "", F.concat(prev, F.lit(" | "), tok))
        .otherwise(tok)
    )


def append_source_token(prev: Column, kind: str, kv: dict[str, Column]) -> Column:
    """Render a kind:{k=v,...} token and append/replace it."""
    return append_rendered_token(prev, kind, render_token(kind, kv))
