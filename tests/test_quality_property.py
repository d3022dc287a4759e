"""Property test: the single-scan DQ engine agrees with a brute-force
Python evaluation of the same checks on randomized data.

Hypothesis drives the data shapes; one Spark job per example is too
slow, so examples are batched — hypothesis generates the row sets,
a single parametrized pass validates them all.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import quality as Q

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),              # id
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),  # amount
        st.one_of(st.none(), st.sampled_from(["USD", "EUR", "XXX", "GBP"])),
    ),
    min_size=1,
    max_size=40,
)


def brute_force(rows):
    """Reference evaluation: required(amount), gt_0(amount),
    isin(currency) with pandera null semantics (null fails only
    ``required``)."""
    expected = set()
    for rid, amount, currency in rows:
        if amount is None:
            expected.add((rid, "amount", "required"))
        elif not amount > 0:
            expected.add((rid, "amount", "gt_0"))
        if currency is not None and currency not in ("USD", "EUR"):
            expected.add((rid, "currency", "isin"))
    return expected


@settings(max_examples=12, deadline=None)
@given(ROWS)
def test_exceptions_engine_matches_brute_force(spark, rows):
    # unique ids per row so comparison is exact
    rows = [(i, a, c) for i, (rid, a, c) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id long, amount double, currency string")
    checks = [
        Q.required("amount"),
        Q.gt("amount", 0),
        Q.isin("currency", ("USD", "EUR")),
    ]
    exc = Q.exceptions_df(df, "t", checks, F.col("id").cast("string"))
    got = {(int(r.row_id), r.column, r.check) for r in exc.collect()}
    assert got == brute_force(rows)
