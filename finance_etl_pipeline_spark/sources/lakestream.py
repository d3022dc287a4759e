"""Streaming source over the manifest log: ``readStream`` a versioned
table (operators/manifest.py) with VERSION NUMBERS as offsets — the
plain-parquet analogue of Delta/Iceberg's table streaming.

Why version offsets make this exactly-once for free: a version is an
immutable FILE SET, so micro-batch (a, b] is "the data dirs appended
by versions a+1..b" — a pure function of the offset pair.  A restarted
query re-reads the same files bit-for-bit; no dedup state, no source
bookkeeping beyond Spark's own offset log.

Contract: APPEND-ONLY streaming.  Version steps that rewrite history
(``mode='overwrite'``) or tombstone rows (``mode='delete'``) are not
expressible as an append stream; ``partitions()`` fails loudly on
them rather than silently replaying or dropping rows — the consumer
should route changefeeds through ``changefeed_rows`` + the CDC sink
instead (tests/test_streaming_changefeed.py).  Hive-partitioned
commits are likewise routed to the changefeed path (the leaf files
do not carry the partition columns).

Scale posture: ``partitions()`` is driver-side manifest JSON; each
executor's Python worker reads ONLY its file via pyarrow and yields
Arrow RecordBatches directly (zero row-at-a-time Python), so a batch
costs one footer + columnar decode per file — the same I/O a batch
scan of those files pays.

Usage::

    spark.dataSource.register(ManifestTableDataSource)
    stream = (spark.readStream.format("manifest_table")
                   .option("table_dir", path).load())
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from finance_etl_pipeline_spark.operators import manifest as M


class _FilePart(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_manifest_safe(table_dir: str, version: int) -> dict:
    """Manifest read with the batch path's clear failure mode: a
    version needed by ``partitions()`` (e.g. a checkpointed start
    offset) that vacuum has expired raises ``VersionNotFoundError``
    with the expired-by-vacuum explanation, not a bare
    FileNotFoundError the operator has to reverse-engineer."""
    return M._read_manifest(table_dir, version)


class ManifestTableDataSource(DataSource):
    """``spark.readStream.format("manifest_table")`` after
    registration.  Options: ``table_dir`` (required)."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table"

    def _table_dir(self) -> str:
        d = self.options.get("table_dir")
        if not d:
            raise ValueError("manifest_table requires option table_dir")
        return d

    def _starting_version(self) -> int:
        """``starting_version`` N (default 0) begins the stream AFTER
        version N: versions 1..N are treated as already consumed — the
        new-consumer escape hatch from replaying deep history (and
        from history already expired by vacuum)."""
        return int(self.options.get("starting_version", 0))

    def schema(self) -> StructType:
        v = M.latest_version(self._table_dir())
        if v == 0:
            raise ValueError(
                f"no published versions under {self._table_dir()}"
            )
        m = _read_manifest_safe(self._table_dir(), v)
        if "schema" not in m:
            raise ValueError(
                "manifest predates schema records; rewrite the table"
            )
        return StructType.fromJson(m["schema"])

    def streamReader(self, schema) -> "ManifestStreamReader":
        return ManifestStreamReader(
            self._table_dir(), schema, self._starting_version()
        )


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(
        self, table_dir: str, schema: StructType, starting_version: int = 0
    ):
        self.table_dir = table_dir
        self.schema = schema
        self.starting_version = starting_version

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        return {"version": M.latest_version(self.table_dir)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        a, b = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        prev_dirs: set[str] = set()
        prev_n_deletes = 0
        if a > 0:
            pm = _read_manifest_safe(self.table_dir, a)
            prev_dirs = set(pm["dirs"])
            prev_n_deletes = len(pm.get("deletes", []))
        for v in range(a + 1, b + 1):
            m = _read_manifest_safe(self.table_dir, v)
            if m.get("mode") != "append":
                raise ValueError(
                    f"version {v} is mode={m.get('mode')!r}: only "
                    "append-only tables stream; use changefeed_rows + "
                    "the CDC sink for rewrites/deletes/updates"
                )
            if len(m.get("deletes", [])) != prev_n_deletes:
                # belt and braces against manifests published by
                # writers predating the distinct 'update'/'delete'
                # modes: a version whose tombstone list changed is not
                # an append no matter what its mode field claims —
                # streaming its new dir as plain inserts would leave
                # consumers holding the stale pre-update copies
                raise ValueError(
                    f"version {v} changed the tombstone list: only "
                    "append-only tables stream; use changefeed_rows + "
                    "the CDC sink for rewrites/deletes/updates"
                )
            new_dirs = [d for d in m["dirs"] if d not in prev_dirs]
            part_dirs = m.get("partitioned_dirs", {})
            for d in new_dirs:
                if d in part_dirs:
                    raise ValueError(
                        f"dir {d} is hive-partitioned: leaf files do "
                        "not carry the partition columns; stream the "
                        "changefeed instead"
                    )
                sj = m.get("dir_schemas", {}).get(d)
                if sj is not None and StructType.fromJson(
                    sj
                ) != self.schema:
                    raise ValueError(
                        f"dir {d} was committed with a different "
                        "schema than the stream started with; "
                        "restart the stream to pick up the evolution"
                    )
                for e in m.get("files", {}).get(d, []):
                    parts.append(
                        _FilePart(
                            os.path.join(self.table_dir, d, e["path"])
                        )
                    )
            prev_dirs = set(m["dirs"])
            prev_n_deletes = len(m.get("deletes", []))
        return parts if parts else [_FilePart("")]

    def read(self, part: _FilePart) -> Iterator:
        if not part.path:
            return
        import pyarrow.parquet as pq

        names = self.schema.fieldNames()
        pf = pq.ParquetFile(part.path)
        for batch in pf.iter_batches():
            # project to the declared column order (parquet files may
            # store columns in any order) and ship Arrow batches
            # straight through — no per-row Python
            yield batch.select(names)

    def commit(self, end: dict) -> None:
        pass  # offsets are version numbers; nothing external to ack
