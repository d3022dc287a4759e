"""Incremental rollup maintenance: merging partial states must equal
full recomputation, at every grain."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.rollup import (
    finish,
    merge_partials,
    reroll,
    rollup_partials,
)
from finance_etl_pipeline_spark.sources.readers import table


def _as_map(df):
    return {
        (r.bucket, r.key): (r.n, r.total_e2) for r in df.collect()
    }


def test_chunked_merge_equals_full_recompute(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    full = rollup_partials(e, "hour")
    state = None
    for chunk_id in range(3):
        chunk = rollup_partials(e.filter(F.col("event_id") % 3 == chunk_id), "hour")
        state = chunk if state is None else merge_partials(state, chunk)
    assert _as_map(state) == _as_map(full)


def test_reroll_equals_direct_grain(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    via_hour = reroll(rollup_partials(e, "hour"), "day")
    direct = rollup_partials(e, "day")
    assert _as_map(via_hour) == _as_map(direct)
    via_day = reroll(via_hour, "month")
    assert _as_map(via_day) == _as_map(rollup_partials(e, "month"))


def test_finish_derives_avg_from_states(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    out = finish(rollup_partials(e, "day"))
    row = out.filter(F.col("n_events") > 0).first()
    # avg_value_e4 derives exactly from the integer state
    expected = row.total_value_e2 / row.n_events / 100
    assert abs(row.avg_value_e4 / 10000 - expected) < 1e-3


def test_bad_grain_rejected(spark, sf_dir):
    import pytest

    e = table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        rollup_partials(e, "week")
