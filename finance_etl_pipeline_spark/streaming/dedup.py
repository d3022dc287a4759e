"""Streaming stateful operators over the Spark-4 TWS API
(``transformWithStateInPandas``): exact-dedup on ingest and per-key
MapState aggregation.

Why TWS and not ``dropDuplicates``: Structured Streaming's built-in
``dropDuplicates`` keeps ALL keys in state forever unless a watermark
column is part of the key, and it cannot express a deterministic
survivor rule.  The processors here own their state explicitly:

- ``stream_exact_dedup`` — first-batch-wins exact dedup keyed by
  content hash, deterministic within a batch (min ``doc_id`` survives,
  matching the batch ``dd_exact_dedup`` survivor policy in
  plans/llm.py).  The seen-set is one boolean ValueState per content
  hash; at 100 TB that is the minimal possible dedup state (the key
  itself lives in the RocksDB state store, hash-partitioned by Spark),
  and TTL (``ttl_hours``) bounds it for sources whose duplicate
  horizon is finite — the knob ``dropDuplicates`` doesn't have.

- ``stream_event_type_counts`` — running per-user event-type counts in
  ONE MapState[event_type -> count] per user, emitting a changelog row
  per (user, type) touched in each batch.  The map iterator path pages
  through the JVM state server (StateResponseWithMapIterator /
  requireNextFetch), which is exactly the surface a per-entity feature
  store needs.

Both run in the default environment through streaming/proto_shim.py
(installed below at import time — i.e. when a worker unpickles these
processors) where the protobuf runtime is absent.

Verified by tests/test_tws_dedup.py: availableNow drain == the batch
oracle on the same files (documents / events testdata parquet).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from finance_etl_pipeline_spark.streaming import proto_shim

proto_shim.install()

DEDUP_OUTPUT_SCHEMA = "content_md5 string, doc_id long, n_chars long"
TYPECOUNT_OUTPUT_SCHEMA = "user_id long, event_type string, n long"


class ExactDedupProcessor(StatefulProcessor):
    """Keyed by content_md5; one boolean ValueState marks the hash as
    seen.  Emits the surviving row only for first-seen hashes; the
    within-batch survivor is min(doc_id) so replays and arbitrary
    batch partitioning produce the same output set."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        ttl_ms = getattr(self, "_ttl_ms", None)
        self._seen = handle.getValueState("seen", "seen boolean", ttl_ms)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        best_id, best_chars = None, None
        for pdf in rows:
            # positional numpy min, not pandas idxmin: this body runs
            # once per KEY, so per-call pandas overhead is the hot path
            ids = pdf["doc_id"].to_numpy()
            i = int(ids.argmin())
            if best_id is None or int(ids[i]) < best_id:
                best_id = int(ids[i])
                best_chars = int(pdf["n_chars"].to_numpy()[i])
        self._seen.update((True,))
        if best_id is not None:
            yield pd.DataFrame(
                {
                    "content_md5": [key[0]],
                    "doc_id": [best_id],
                    "n_chars": [best_chars],
                }
            )

    def close(self) -> None:
        pass


def stream_exact_dedup(
    documents: DataFrame, ttl_hours: float | None = None
) -> DataFrame:
    """First-occurrence-kept exact dedup of a document stream.

    ``ttl_hours`` bounds the seen-set for finite duplicate horizons
    (e.g. a crawler that never re-emits after a week); None keeps
    state forever, matching batch-global dedup semantics."""
    proc = ExactDedupProcessor()
    if ttl_hours is not None:
        proc._ttl_ms = int(ttl_hours * 3_600_000)
    return (
        documents.select(
            F.md5(F.col("text").cast("binary")).alias("content_md5"),
            "doc_id",
            "n_chars",
        )
        .groupBy("content_md5")
        .transformWithStateInPandas(
            proc,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


class EventTypeCountProcessor(StatefulProcessor):
    """Keyed by user_id; MapState[event_type -> running count].
    Emits one changelog row per (user, event_type) touched in the
    batch carrying the post-batch running count."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n long"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch: dict[str, int] = {}
        for pdf in rows:
            for et, n in pdf["event_type"].value_counts().items():
                batch[et] = batch.get(et, 0) + int(n)
        out_types, out_counts = [], []
        for et, n in sorted(batch.items()):
            prev = self._counts.getValue((et,))
            total = (prev[0] if prev is not None else 0) + n
            self._counts.updateValue((et,), (total,))
            out_types.append(et)
            out_counts.append(total)
        if out_types:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_types),
                    "event_type": out_types,
                    "n": out_counts,
                }
            )

    def close(self) -> None:
        pass


def stream_event_type_counts(events: DataFrame) -> DataFrame:
    """Running per-user event-type counts as an append changelog."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            EventTypeCountProcessor(),
            outputStructType=TYPECOUNT_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
