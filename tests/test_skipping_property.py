"""Property-based check of the manifest file-skipping proofs.

``_file_may_match`` must NEVER prune a file containing a satisfying
row (pruning is an optimization, not a filter), and
``_file_all_match`` must NEVER claim full-match for a file holding a
non-satisfying row (it drops files from the plan outright).  Both are
proofs over min/max/null stats, so we fuzz them: generate a column of
random values, derive its stats exactly the way ``_harvest_one``
records them, generate a random predicate, evaluate the truth
row-by-row in plain Python, and assert both implications.  Pure
Python — no Spark session — so hypothesis can run hundreds of cases.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from finance_etl_pipeline_spark.operators.manifest import (
    _file_all_match,
    _file_may_match,
    _json_safe,
)

_COL = "c"

# value universes: each list draws from ONE comparable domain, with
# None (SQL NULL) mixed in
_INTS = st.integers(min_value=-50, max_value=50)
_FLOATS = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
)
_STRS = st.text(alphabet="abcxyz", min_size=0, max_size=4)
_DATES = st.dates(
    min_value=datetime.date(2020, 1, 1), max_value=datetime.date(2020, 3, 1)
)


def _domain():
    return st.one_of(
        st.tuples(st.just("int"), st.lists(st.one_of(st.none(), _INTS), min_size=1, max_size=12)),
        st.tuples(st.just("float"), st.lists(st.one_of(st.none(), _FLOATS), min_size=1, max_size=12)),
        st.tuples(st.just("str"), st.lists(st.one_of(st.none(), _STRS), min_size=1, max_size=12)),
        st.tuples(st.just("date"), st.lists(st.one_of(st.none(), _DATES), min_size=1, max_size=12)),
    )


def _value_for(kind, draw_from):
    return {
        "int": _INTS,
        "float": _FLOATS,
        "str": _STRS,
        "date": _DATES,
    }[kind]


def _entry_for(values):
    """Stats exactly as ``_harvest_one`` would record them from a
    parquet footer: JSON-safe min/max over non-null values, null
    count, row count."""
    non_null = [v for v in values if v is not None]
    stats = {
        _COL: {
            "min": _json_safe(min(non_null)) if non_null else None,
            "max": _json_safe(max(non_null)) if non_null else None,
            "nulls": sum(1 for v in values if v is None),
        }
    }
    return {"path": "f.parquet", "rows": len(values), "stats": stats}


def _row_satisfies(v, op, arg) -> bool:
    """SQL three-valued logic collapsed to boolean (a WHERE keeps a
    row only when the predicate is TRUE)."""
    if op == "is_null":
        return v is None
    if op == "is_not_null":
        return v is not None
    if v is None:
        return False
    if op == "in":
        return v in arg
    return {
        "==": v == arg,
        "!=": v != arg,
        "<": v < arg,
        "<=": v <= arg,
        ">": v > arg,
        ">=": v >= arg,
    }[op]


@st.composite
def _case(draw):
    kind, values = draw(_domain())
    op = draw(
        st.sampled_from(
            ["==", "!=", "<", "<=", ">", ">=", "in", "is_null", "is_not_null"]
        )
    )
    if op == "in":
        arg = draw(st.lists(_value_for(kind, values), min_size=1, max_size=4))
    elif op in ("is_null", "is_not_null"):
        arg = None
    else:
        # bias half the draws toward values actually present, so
        # equality/boundary cases are exercised, not just misses
        present = [v for v in values if v is not None]
        if present and draw(st.booleans()):
            arg = draw(st.sampled_from(present))
        else:
            arg = draw(_value_for(kind, values))
    return values, op, arg


@given(_case())
@settings(max_examples=400, deadline=None)
def test_may_match_never_prunes_a_satisfying_row(case):
    values, op, arg = case
    entry = _entry_for(values)
    pred = [(_COL, op, arg)]
    any_true = any(_row_satisfies(v, op, arg) for v in values)
    may = _file_may_match(entry, pred, present={_COL})
    # soundness: a pruned file (may == False) must contain NO
    # satisfying row.  (may == True with no satisfying row is fine —
    # the proof is conservative and the residual filter re-applies.)
    if any_true:
        assert may, (values, op, arg)


@given(_case())
@settings(max_examples=400, deadline=None)
def test_all_match_never_claims_a_failing_row(case):
    values, op, arg = case
    entry = _entry_for(values)
    pred = [(_COL, op, arg)]
    all_true = all(_row_satisfies(v, op, arg) for v in values)
    claims = _file_all_match(entry, pred, present={_COL})
    # soundness: a full-match claim drops the file from tombstone
    # scans — every row must really satisfy the predicate
    if claims:
        assert all_true, (values, op, arg)


@given(_case())
@settings(max_examples=200, deadline=None)
def test_absent_column_semantics(case):
    """A file whose physical schema lacks the column reads it as NULL
    for every row: only is_null can match, and is_null fully
    matches."""
    values, op, arg = case
    entry = _entry_for(values)
    pred = [(_COL, op, arg)]
    may = _file_may_match(entry, pred, present=set())
    alls = _file_all_match(entry, pred, present=set())
    if op == "is_null":
        assert may and alls
    else:
        assert not may and not alls
