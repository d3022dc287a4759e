"""Property test: upsert == dict-merge semantics on random inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from finance_etl_pipeline_spark.operators.merge import upsert

ROWS = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
    min_size=0,
    max_size=25,
)


def _dedupe(rows):
    # keep the last value per key (mirrors order_col compaction on a
    # monotonically increasing version)
    out = {}
    for i, (k, v) in enumerate(rows):
        out[k] = (v, i)
    return out


@settings(max_examples=10, deadline=None)
@given(ROWS, ROWS)
def test_upsert_matches_dict_merge(spark, target_rows, source_rows):
    tgt = _dedupe(target_rows)
    src = _dedupe(source_rows)
    expected = {**{k: v for k, (v, _) in tgt.items()},
                **{k: v for k, (v, _) in src.items()}}

    target = spark.createDataFrame(
        [(k, v, i) for k, (v, i) in tgt.items()] or [(None, None, None)],
        "id long, val long, ver long",
    ).filter("id IS NOT NULL")
    source = spark.createDataFrame(
        [(k, v, i) for k, (v, i) in src.items()] or [(None, None, None)],
        "id long, val long, ver long",
    ).filter("id IS NOT NULL")

    got = {r.id: r.val for r in upsert(target, source, ["id"]).collect()}
    assert got == expected
