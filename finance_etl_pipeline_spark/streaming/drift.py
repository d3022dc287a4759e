"""Streaming drift monitor: per-micro-batch PSI against a static
reference histogram — the online twin of plans/curation.py's
drift_psi_events.

Ops pattern: the reference distribution (training window) is computed
ONCE and broadcast as a plain dict of bin counts; each micro-batch
bins its own values (same fixed-width buckets), merges counts into a
running state table via foreachBatch, and emits the PSI of
(accumulated stream) vs (reference).  Because the bins are fixed and
the counts additive, the accumulated streaming PSI after the last
batch equals the batch PSI over the same rows — which is exactly what
the test asserts.

At scale: per-batch work is one map + 10-row aggregate; the running
state is 10 rows total.  Alerting (PSI > 0.2 = "significant shift")
is a filter on the emitted frame."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BINS = 10
BIN_W = 50.0


def bin_col(value_col: str = "value"):
    return F.least(
        F.floor(F.col(value_col) / BIN_W).cast("int"), F.lit(N_BINS - 1)
    ).alias("bin")


def reference_histogram(ref: DataFrame) -> dict[int, int]:
    """Static reference bin counts, collected once (10 rows)."""
    rows = ref.select(bin_col()).groupBy("bin").count().collect()
    return {r["bin"]: r["count"] for r in rows}


def psi(ref_counts: dict[int, int], obs_counts: dict[int, int]) -> float:
    """Laplace-smoothed PSI over the fixed bin domain (same formula
    as the drift_psi_events oracle)."""
    ta = sum(ref_counts.values()) + N_BINS
    tb = sum(obs_counts.values()) + N_BINS
    total = 0.0
    for b in range(N_BINS):
        pa = (ref_counts.get(b, 0) + 1) / ta
        pb = (obs_counts.get(b, 0) + 1) / tb
        total += (pa - pb) * math.log(pa / pb)
    return total


class StreamingDriftMonitor:
    """Accumulates streamed bin counts via foreachBatch and records
    the PSI trajectory (one reading per non-empty batch)."""

    def __init__(self, ref_counts: dict[int, int]) -> None:
        self.ref_counts = dict(ref_counts)
        self.acc: dict[int, int] = {}
        self.trajectory: list[float] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(bin_col()).groupBy("bin").count().collect()
        if not rows:
            return
        for r in rows:
            self.acc[r["bin"]] = self.acc.get(r["bin"], 0) + r["count"]
        self.trajectory.append(psi(self.ref_counts, self.acc))

    def attach(self, stream: DataFrame, query_name: str = "drift"):
        """Start the monitor on a streaming DataFrame of events."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
