"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-events source, batch AND micro-batch
streaming.

Why it exists: the engine's generator surface (sample_data.py) writes
files; a DataSource generates *inside the scan* — the pattern for
load-testing a 1000-executor cluster without staging input (each
partition synthesizes its slice locally, so "reading" 100 TB costs no
storage and no network). It is also the template for wrapping any
Python-reachable system (REST cursors, queues) as a first-class
`spark.read.format(...)` citizen with real partition parallelism.

Determinism contract: row ``i``'s payload is a pure function of ``i``
(Knuth multiplicative hash) — no RNG state crosses partition
boundaries, so any partitioning of [0, n) yields the identical table,
re-reads are bit-stable, and a pandas twin can verify rows exactly.

Scale posture: ``partitions()`` returns ``n_partitions`` equal ranges
(a driver-side list of O(partitions) ints); each executor materializes
only its slice, batched through Arrow by the Python worker. Range
filters on ``event_id`` prune generation entirely via the opt-in
pushdown reader (``option("pushdown", "true")`` + the
``spark.sql.python.filterPushdown.enabled`` conf); the default reader
omits ``pushFilters`` because Spark refuses to read from a reader
that defines it while the conf is off.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_KNUTH = 2654435761
_TYPES = ("view", "click", "purchase", "error")


def row_at(i: int) -> tuple[int, int, str, float]:
    """The content-addressed payload for row id ``i`` (shared with the
    tests' pandas twin)."""
    h = (i * _KNUTH) % (2**32)
    return (
        i,
        h % 97,
        _TYPES[h % len(_TYPES)],
        (h % 10_000) / 100.0,
    )


SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``.

    Options: ``n_rows`` (default 1000), ``n_partitions`` (default 4),
    streaming adds ``rows_per_batch`` (default 0 = everything in one
    micro-batch; positive = rate-limited advance per batch)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        # pushFilters is opt-in: Spark refuses ANY read from a reader
        # that merely DEFINES pushFilters() unless
        # spark.sql.python.filterPushdown.enabled is set, so the
        # pushdown-capable subclass only appears when asked for
        # (option("pushdown", "true") + the session conf).
        if str(self.options.get("pushdown", "")).lower() == "true":
            return SyntheticEventsPushdownReader(self.options)
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n_rows", 1000))
        self.p = max(1, int(options.get("n_partitions", 4)))
        # effective scan bounds — pushFilters narrows these
        self.lo = 0
        self.hi = self.n

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi == lo:
            return [_Range(lo, lo)]
        step = -(-(hi - lo) // self.p)  # ceil — last range may be short
        return [
            _Range(x, min(x + step, hi)) for x in range(lo, hi, step)
        ]

    def read(self, part: _Range) -> Iterator[tuple]:
        for i in range(part.lo, part.hi):
            yield row_at(i)


class SyntheticEventsPushdownReader(SyntheticEventsReader):
    """Pushdown-capable variant (see ``reader()`` for why it is a
    separate class).  Requires
    ``spark.sql.python.filterPushdown.enabled=true``."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Range pushdown on event_id: comparison filters against the
        row-id column shrink [lo, hi) so pruned rows are never even
        GENERATED — the custom-source analogue of parquet row-group
        skipping.  Consumed filters are applied exactly (range
        semantics), so they are not yielded back; anything else is
        returned as unsupported and Spark re-applies it post-scan."""
        for f in filters:
            if getattr(f, "attribute", None) == ("event_id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch twin: offset = next row id to emit.  With
    ``rows_per_batch`` unset (or 0), ``latestOffset`` reports all
    ``n_rows`` at once — the whole table lands in one micro-batch,
    which is what ``trigger(availableNow=True)`` needs (Spark captures
    the FIRST latestOffset as the drain target, so a rate-limited
    offset would stop the drain after one window).  With a positive
    ``rows_per_batch``, each ``latestOffset`` call advances by that
    many rows until ``n_rows`` then idles — real admission control for
    processing-time triggers.  The offset log is the single source of
    truth — a restarted query resumes exactly where the checkpoint
    says (``commit`` re-seats the advance point), and because payloads
    are content-addressed, replayed batches are bit-identical
    (the exactly-once story for a synthetic source)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n_rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 0))
        self.p = max(1, int(options.get("n_partitions", 4)))
        self._last = 0  # highest offset this reader instance reported

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        if self.per_batch <= 0:
            self._last = self.n
        else:
            self._last = min(self._last + self.per_batch, self.n)
        return {"next": self._last}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["next"], min(end["next"], self.n)
        if hi <= lo:
            return [_Range(lo, lo)]
        step = -(-(hi - lo) // self.p)
        return [
            _Range(x, min(x + step, hi)) for x in range(lo, hi, step)
        ]

    def read(self, part: _Range) -> Iterator[tuple]:
        for i in range(part.lo, part.hi):
            yield row_at(i)

    def commit(self, end: dict) -> None:
        # offsets are self-describing; the only bookkeeping is keeping
        # the advance point monotone so a reader restarted mid-stream
        # (fresh _last = 0, checkpointed start > 0) snaps forward to
        # the committed position instead of re-crawling from zero
        self._last = max(self._last, int(end["next"]))
