"""Python UDTF (user-defined TABLE function) template — the lateral
row-expander for logic that emits a variable number of typed rows per
input and genuinely can't be an `explode(transform(...))` expression
(think: a real tokenizer, a parser with lookahead state, a decoder
yielding frames).

This completes the repo's Python-integration taxonomy (SURVEY.md §4):
  expression (preferred) > scalar pandas_udf (functions/vectorized.py)
  > grouped map / mapInPandas (operators/grouped.py, multimodal.py)
  > stateful streaming (streaming/stateful.py, tws.py)
  > UDTF (this module: per-row fan-out with imperative logic).

UDTFs evaluate row-at-a-time in Python — the SLOWEST lane here; the
demo splitter is intentionally also checkable against array
expressions (tests/test_udtf.py) so the plumbing is verified, and the
docstring rule stands: reach for a UDTF only when the per-row logic
is truly imperative.  At scale the fan-out is narrow (no shuffle);
cost is the Python row loop, so keep UDTF stages off the hot path or
behind a pre-filter."""

from __future__ import annotations

from pyspark.sql.functions import udtf

SPAN_WIDTH = 80  # target characters per span


@udtf(returnType="span_idx int, start_char int, end_char int, span_text string")
class SpanSplitter:
    """Split text into ~SPAN_WIDTH-char spans snapped BACK to the last
    whitespace so no word is cut; emits (idx, [start, end), text).
    Imperative scanning with lookbehind — the kind of stateful per-row
    logic that earns a UDTF."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        n = len(text)
        start = idx = 0
        while start < n:
            end = min(start + SPAN_WIDTH, n)
            if end < n:
                snap = text.rfind(" ", start, end)
                if snap > start:
                    end = snap
            yield (idx, start, end, text[start:end])
            idx += 1
            # skip the separator space so spans never start mid-gap
            while end < n and text[end] == " ":
                end += 1
            start = end
