"""Streaming == batch semantics parity (availableNow drain)."""

from __future__ import annotations

import os
import shutil

import pytest

from finance_etl_pipeline_spark.plans import all_queries
from finance_etl_pipeline_spark.streaming.events import (
    drain_to_memory,
    read_events_stream,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-stream source wants a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    got = drain_to_memory(tumbling_counts(stream), "t_tumbling", spark)
    batch = all_queries()["e_tumbling_window"].fn(spark, sf_dir)
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    got_rows = {key(r): (r.n_events, r.total_value) for r in got.collect()}
    batch_rows = {key(r): (r.n_events, r.total_value) for r in batch.collect()}
    assert got_rows == batch_rows
