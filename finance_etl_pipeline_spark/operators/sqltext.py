"""Shared SQL-text lexing helpers — the ONE quote-discipline
implementation both the DML layer (time-travel rewriting) and the
catalog (view-reference scanning) build on, so the two can never
drift on escape rules.

Reference parity: the reference pipeline has no SQL text surface;
this follows standard SQL lexing (doubled-character escapes inside
quoted regions, Spark's backtick-quoted identifiers).
"""

from __future__ import annotations

#: single-quoted and double-quoted STRING literals, plus Spark's
#: backtick-quoted IDENTIFIERS — a time-travel rewrite or a view-ref
#: scan must see none of their contents
QUOTE_CHARS = ("'", '"', "`")


def mask_quotes(s: str, quotes: tuple = QUOTE_CHARS) -> str:
    """Same-length copy with quoted-region CONTENTS blanked (the
    delimiter characters are kept), so regexes over the mask can never
    match inside a literal or a quoted identifier while match spans
    still index into the original.  A doubled delimiter inside its own
    region is the escape form and stays masked."""
    out = list(s)
    q = None
    i = 0
    while i < len(s):
        c = s[i]
        if q:
            if c == q:
                if i + 1 < len(s) and s[i + 1] == q:
                    out[i] = out[i + 1] = " "
                    i += 1
                else:
                    q = None
            else:
                out[i] = " "
        elif c in quotes:
            q = c
        i += 1
    return "".join(out)
