"""Batch + streaming source over the manifest log: ``spark.read`` /
``readStream`` a versioned table (operators/manifest.py) as a
first-class ``format("manifest_table")`` citizen — the plain-parquet
analogue of Delta/Iceberg's table read surface.

BATCH (``reader``): resolves one snapshot (``version`` /
``as_of`` / latest), routes supported predicates through the SAME
footer-stats file-skipping proofs that ``read_version(where=...)``
uses (``pushFilters`` — opt-in, see below), applies merge-on-read
tombstones and schema-evolution NULL fill per file, and reconstructs
hive partition columns from paths.  Every pushed filter is also
yielded back to Spark for exact re-application — pruning is a
may-match proof, never a semantics change.  This is the SQL surface
(``cli.py sql --manifest-table name=dir``); the pure-JVM fast path
for heavy jobs remains ``manifest.read_version``.

STREAMING (``streamReader``): VERSION NUMBERS are the offsets.  A
version is an immutable FILE SET, so micro-batch (a, b] is "the data
dirs appended by versions a+1..b" — a pure function of the offset
pair, which makes the source exactly-once for free: a restarted query
re-reads the same files bit-for-bit; no dedup state, no source
bookkeeping beyond Spark's own offset log.

Streaming contract: APPEND-ONLY.  Version steps that rewrite history
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
import uuid
from collections import OrderedDict
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from finance_etl_pipeline_spark.operators import manifest as M


class _FilePart(InputPartition):
    def __init__(self, path: str, phys_names: list | None = None):
        self.path = path
        #: physical column names to read, in the stream schema's
        #: logical order (None = logical == physical, the common case)
        self.phys_names = phys_names


def _read_manifest_safe(table_dir: str, version: int) -> dict:
    """Manifest read with the batch path's clear failure mode: a
    version needed by ``partitions()`` (e.g. a checkpointed start
    offset) that vacuum has expired raises ``VersionNotFoundError``
    with the expired-by-vacuum explanation, not a bare
    FileNotFoundError the operator has to reverse-engineer."""
    return M._read_manifest(table_dir, version)


class ManifestTableDataSource(DataSource):
    """``spark.read`` / ``spark.readStream`` ``.format("manifest_table")``
    after registration.

    Options: ``table_dir`` (required); batch reads add ``version``
    (int time travel) or ``as_of`` (timestamp time travel, ISO-8601
    or epoch seconds) and ``pushdown`` ("true" enables
    ``pushFilters`` file skipping — requires the session conf
    ``spark.sql.python.filterPushdown.enabled``, same opt-in shape as
    the synthetic-events source); batch WRITES
    (``df.write.format("manifest_table")``, mode append/overwrite)
    add ``txn_app_id`` + ``txn_version`` for exactly-once replayed
    jobs; streaming reads add ``starting_version`` or
    ``starting_timestamp``, plus admission control via
    ``max_files_per_trigger`` (hard per-batch file cap, >= 1) and
    ``max_bytes_per_trigger`` (soft per-batch byte cap; accepts
    '64m'-style suffixes) — see ``ManifestStreamReader``."""

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
        from history already expired by vacuum).
        ``starting_timestamp`` is the time-based form (Delta's
        startingTimestamp): versions committed strictly BEFORE the
        instant are treated as consumed, so the stream emits every
        version at or after it."""
        sv = self.options.get("starting_version")
        st = self.options.get("starting_timestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "pass starting_version OR starting_timestamp, not both"
            )
        if isinstance(sv, str) and sv.strip().lower() == "latest":
            # Delta's startingVersion=latest: only data committed
            # AFTER the stream starts — everything current is treated
            # as consumed
            return M.latest_version(self._table_dir())
        if st is not None:
            try:
                st = float(st)
            except ValueError:
                pass  # ISO-8601 form
            try:
                # latest version committed BEFORE the instant = the
                # last already-consumed offset
                v = M.version_as_of(self._table_dir(), st)
            except M.VersionNotFoundError:
                return 0  # instant predates v1: stream everything
            ts_v = _read_manifest_safe(self._table_dir(), v).get("ts")
            if ts_v is not None and ts_v == M._as_epoch(st):
                v -= 1  # committed exactly AT the instant: still due
            return v
        return int(sv or 0)

    def _resolve_version(self) -> int:
        """The snapshot a batch read resolves: explicit ``version``,
        else ``as_of`` timestamp resolution, else the current tip.

        Resolved ONCE per DataSource instance and cached: Spark calls
        ``schema()`` and ``reader()`` separately, and a commit landing
        between the two calls must not hand the reader a newer
        snapshot than the schema was taken from (the torn-read shape
        the manifest protocol exists to kill)."""
        cached = getattr(self, "_resolved_version", None)
        if cached is not None:
            return cached
        v = self.options.get("version")
        as_of = self.options.get("as_of")
        if v is not None and as_of is not None:
            raise ValueError("pass version OR as_of, not both")
        if v is not None:
            resolved = int(v)
        elif as_of is not None:
            try:
                as_of = float(as_of)
            except ValueError:
                pass  # ISO-8601 string form
            resolved = M.version_as_of(self._table_dir(), as_of)
        else:
            resolved = M.latest_version(self._table_dir())
        self._resolved_version = resolved
        return resolved

    def schema(self) -> StructType:
        v = self._resolve_version()
        if v == 0:
            raise ValueError(
                f"no published versions under {self._table_dir()}"
            )
        m = _read_manifest_safe(self._table_dir(), v)
        if "schema" not in m:
            raise ValueError(
                "manifest predates schema records; rewrite the table"
            )
        schema = StructType.fromJson(m["schema"])
        # all-nullable: schema evolution means any column can surface
        # as NULL for files committed before it existed, and a
        # not-null contract the reader cannot enforce would let Spark
        # miscompile downstream null checks
        for f in schema.fields:
            f.nullable = True
        return schema

    def reader(self, schema) -> "ManifestBatchReader":
        # same opt-in split as pydatasource.py: Spark refuses ANY read
        # from a reader that merely DEFINES pushFilters() unless
        # spark.sql.python.filterPushdown.enabled is on, so the
        # pushdown-capable subclass only appears when asked for
        if str(self.options.get("pushdown", "")).lower() == "true":
            return ManifestBatchPushdownReader(
                self._table_dir(), schema, self._resolve_version()
            )
        return ManifestBatchReader(
            self._table_dir(), schema, self._resolve_version()
        )

    def writer(self, schema, overwrite: bool) -> "ManifestBatchWriter":
        # CHECK constraints are validated by a Spark job INSIDE the
        # publish (manifest._validate_new_dir); the Python DataSource
        # write hooks run in an isolated runner with no SparkSession,
        # so they cannot run that job.  Refuse loudly rather than
        # publish unvalidated rows into a constrained table.
        cons = M.table_constraints(self._table_dir())
        if cons:
            raise ValueError(
                f"table has CHECK constraints {sorted(cons)}: the "
                "Python DataSource write path cannot run Spark-side "
                "validation — write via manifest.commit / merge_into "
                "(they validate inside the publish), or drop the "
                "constraint first"
            )
        if M.table_column_mapping(self._table_dir()):
            raise ValueError(
                "table has renamed columns (column mapping): the "
                "DataSource write path writes logical names — write "
                "via manifest.commit / overwrite_partitions, which "
                "translate to the physical layout"
            )
        txn = None
        app = self.options.get("txn_app_id")
        ver = self.options.get("txn_version")
        if (app is None) != (ver is None):
            raise ValueError("txn_app_id and txn_version go together")
        if app is not None:
            txn = (app, int(ver))
        pb = self.options.get("partition_by")
        partition_by = (
            [c.strip() for c in pb.split(",") if c.strip()] if pb else []
        )
        missing = [c for c in partition_by if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"partition_by columns not in schema: {missing}")
        if partition_by and len(partition_by) == len(schema.fieldNames()):
            raise ValueError("cannot partition by every column")
        pom = str(self.options.get("partition_overwrite_mode", "")).lower()
        if pom and pom not in ("static", "dynamic"):
            raise ValueError(
                f"partition_overwrite_mode must be static|dynamic, got {pom!r}"
            )
        dynamic = pom == "dynamic"
        if dynamic and not overwrite:
            raise ValueError(
                "partition_overwrite_mode=dynamic needs mode('overwrite')"
            )
        if dynamic and not partition_by:
            raise ValueError(
                "partition_overwrite_mode=dynamic needs partition_by"
            )
        return ManifestBatchWriter(
            self._table_dir(),
            schema,
            overwrite,
            txn,
            partition_by=partition_by,
            dynamic=dynamic,
        )

    @staticmethod
    def _parse_size(s) -> int:
        """'10k' / '64m' / '1g' / plain int → bytes."""
        s = str(s).strip().lower()
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(s[-1:], None)
        n = int(s[:-1]) * mult if mult else int(s)
        if n <= 0:
            raise ValueError(f"size option must be positive, got {s!r}")
        return n

    def streamReader(self, schema) -> "ManifestStreamReader":
        mf = self.options.get("max_files_per_trigger")
        mb = self.options.get("max_bytes_per_trigger")
        max_files = int(mf) if mf is not None else None
        if max_files is not None and max_files < 1:
            raise ValueError("max_files_per_trigger must be >= 1")
        max_bytes = self._parse_size(mb) if mb is not None else None
        return ManifestStreamReader(
            self._table_dir(),
            schema,
            self._starting_version(),
            max_files=max_files,
            max_bytes=max_bytes,
        )


class _SnapshotFilePart(InputPartition):
    """One surviving data file of the resolved snapshot, with the
    metadata its executor-side read needs: the tombstone conjunctions
    scoped to its dir (already reduced to the ones its stats could
    not prove fully-matching) and the hive partition values parsed
    from its path (constants for every row of the file)."""

    def __init__(
        self,
        path: str,
        dels: list[list[tuple]],
        part_values: dict[str, object],
    ):
        self.path = path
        self.dels = dels
        self.part_values = part_values


def _coerce_for_arrow(value, typ):
    """A JSON-stored predicate/partition value in the Python form
    pyarrow compares correctly against column type ``typ`` (dates and
    timestamps are stored as fixed-width strings — see
    ``manifest._json_safe``)."""
    import datetime

    import pyarrow as pa

    if value is None:
        return value
    if not isinstance(value, str):
        # last-resort guard: a numeric-looking value headed into a
        # string column renders as text rather than raising in
        # pa.array / pa.scalar (the caller should have kept the raw
        # string; see ManifestBatchReader.partitions)
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return str(value)
        return value
    if pa.types.is_date(typ):
        return datetime.date.fromisoformat(value)
    if pa.types.is_timestamp(typ):
        fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in value else "%Y-%m-%d %H:%M:%S"
        return datetime.datetime.strptime(value, fmt)
    return value


def _const_matches(op: str, actual, value) -> bool:
    """Evaluate one tombstone predicate against a per-file CONSTANT
    (a hive partition value): True = every row of the file satisfies
    it, False = no row does.  NULL constants never satisfy
    comparisons (SQL three-valued logic collapses to False here)."""
    if op == "is_null":
        return actual is None
    if op == "is_not_null":
        return actual is not None
    if actual is None:
        return False
    try:
        if op == "in":
            return actual in value
        return {
            "==": actual == value,
            "!=": actual != value,
            "<": actual < value,
            "<=": actual <= value,
            ">": actual > value,
            ">=": actual >= value,
        }[op]
    except TypeError:
        return False


class ManifestBatchReader(DataSourceReader):
    """Batch half of the source: one snapshot, one partition per
    surviving file.  Executors read their file via pyarrow and yield
    Arrow RecordBatches aligned to the snapshot's logical schema —
    missing columns (schema evolution) as typed NULLs, hive partition
    columns as per-file constants, merge-on-read tombstones applied
    as an Arrow compute mask.  No row-at-a-time Python anywhere."""

    def __init__(self, table_dir: str, schema: StructType, version: int):
        self.table_dir = table_dir
        self.schema = schema
        self.version = version
        #: {logical: physical} column mapping of the snapshot —
        #: loaded here (driver side) so executors get it via pickle;
        #: {} for unmapped tables (every use below is then identity)
        self.mapping = M._load_mapping(
            _read_manifest_safe(table_dir, version) if version else None
        )[0]
        #: predicates available for file skipping (populated by the
        #: pushdown subclass; pruning-only — Spark re-applies them)
        self._skip_preds: list[tuple] = []

    def partitions(self) -> Sequence[InputPartition]:
        from urllib.parse import unquote

        from pyspark.sql.types import StringType

        m = _read_manifest_safe(self.table_dir, self.version)
        deletes = m.get("deletes", [])
        files_meta = M._load_files(self.table_dir, m)
        dir_schemas = M._load_dir_schemas(m)
        # logical string partition columns keep the RAW path component
        # — int/float inference would turn '001' into 1 and the Arrow
        # constant materialization would either raise (int into a
        # string array) or silently drop the leading zeros.  Path
        # components carry PHYSICAL names, so map before comparing.
        string_cols = {
            self.mapping.get(f.name, f.name)
            for f in self.schema.fields
            if isinstance(f.dataType, StringType)
        }
        skip_preds = M._phys_preds(self.mapping, self._skip_preds)
        parts: list[InputPartition] = []
        for d in m["dirs"]:
            entries = files_meta.get(d)
            if entries is None:
                raise ValueError(
                    f"dir {d} has no per-file manifest entries (legacy "
                    "manifest); rewrite the table to use the batch reader"
                )
            sj = dir_schemas.get(d)
            present = (
                set(StructType.fromJson(sj).fieldNames()) if sj else None
            )
            del_preds = [
                [M._normalize_pred(tuple(p)) for p in dl["preds"]]
                for dl in deletes
                if d in dl["dirs"]
            ]
            for e in entries:
                if skip_preds and not M._file_may_match(
                    e, skip_preds, present
                ):
                    continue
                if any(
                    M._file_all_match(e, dp, present) for dp in del_preds
                ):
                    continue
                rel = e["path"]
                part_values: dict[str, object] = {}
                for comp in rel.split("/")[:-1]:
                    if "=" in comp:
                        k, _, v = comp.partition("=")
                        if v == "__HIVE_DEFAULT_PARTITION__":
                            part_values[k] = None
                        elif k in string_cols:
                            part_values[k] = unquote(v)
                        else:
                            part_values[k] = M._parse_partition_value(v)
                # only tombstones the stats could not already decide
                live_dels = [
                    dp
                    for dp in del_preds
                    if M._file_may_match(e, dp, present)
                ]
                parts.append(
                    _SnapshotFilePart(
                        os.path.join(self.table_dir, d, rel),
                        live_dels,
                        part_values,
                    )
                )
        return parts if parts else [_SnapshotFilePart("", [], {})]

    def read(self, part: _SnapshotFilePart) -> Iterator:
        if not part.path:
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        pf = pq.ParquetFile(part.path)
        physical = set(pf.schema_arrow.names)
        # logical field -> the PHYSICAL column name the file stores
        pname = {n: self.mapping.get(n, n) for n in target.names}
        want = [pname[n] for n in target.names if pname[n] in physical]

        def tombstone_mask(batch: pa.RecordBatch):
            """AND-of-ORs is not needed — each tombstone is a
            conjunction; a row matching ANY tombstone is deleted.
            Returns the KEEP mask, or None for keep-everything."""
            delete_any = None
            for conj in part.dels:
                mask = None  # all-true until a predicate narrows it
                for col, op, value in conj:
                    if col in part.part_values:
                        if _const_matches(op, part.part_values[col], value):
                            continue  # satisfied by every row
                        mask = False
                        break
                    if col not in physical:
                        # column reads as NULL in this file
                        if op == "is_null":
                            continue
                        mask = False
                        break
                    arr = batch.column(col)
                    if op == "is_null":
                        m_ = pc.is_null(arr)
                    elif op == "is_not_null":
                        m_ = pc.is_valid(arr)
                    elif op == "in":
                        vs = [_coerce_for_arrow(v, arr.type) for v in value]
                        m_ = pc.is_in(
                            arr, value_set=pa.array(vs, type=arr.type)
                        )
                    else:
                        v = _coerce_for_arrow(value, arr.type)
                        m_ = {
                            "==": pc.equal,
                            "!=": pc.not_equal,
                            "<": pc.less,
                            "<=": pc.less_equal,
                            ">": pc.greater,
                            ">=": pc.greater_equal,
                        }[op](arr, pa.scalar(v, type=arr.type))
                    # NULL comparison results never match the delete
                    m_ = pc.fill_null(m_, False)
                    mask = m_ if mask is None else pc.and_(mask, m_)
                if mask is False:
                    continue  # this tombstone matches no row here
                if mask is None:
                    return "all"  # every row of the file is deleted
                delete_any = (
                    mask if delete_any is None else pc.or_(delete_any, mask)
                )
            if delete_any is None:
                return None
            return pc.invert(delete_any)

        for batch in pf.iter_batches(columns=want):
            keep = tombstone_mask(batch)
            if isinstance(keep, str):  # "all": every row tombstoned
                continue
            if keep is not None:
                batch = batch.filter(keep)
            n = batch.num_rows
            arrays = []
            for field in target:
                p = pname[field.name]
                if p in physical:
                    arrays.append(batch.column(p).cast(field.type))
                elif p in part.part_values:
                    v = _coerce_for_arrow(
                        part.part_values[p], field.type
                    )
                    arrays.append(pa.array([v] * n, type=field.type))
                else:
                    arrays.append(pa.nulls(n, type=field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)


class ManifestBatchPushdownReader(ManifestBatchReader):
    """Pushdown-capable variant (separate class for the same conf
    opt-in reason as ``SyntheticEventsPushdownReader``).  Supported
    predicates are translated to the manifest's (col, op, value)
    triples and used ONLY to prune the file list against the per-file
    footer stats — exactly ``read_version(where=...)``'s proofs.
    Every filter (supported or not) is yielded back, so Spark
    re-applies all of them exactly: a may-match proof can keep a file
    whose rows then fail the filter; it can never change an answer."""

    _OPS = {
        EqualTo: "==",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if isinstance(attr, tuple) and len(attr) == 1:
                col = attr[0]
                if isinstance(f, IsNull):
                    self._skip_preds.append((col, "is_null", None))
                elif isinstance(f, IsNotNull):
                    self._skip_preds.append((col, "is_not_null", None))
                elif isinstance(f, In):
                    self._skip_preds.append((col, "in", list(f.value)))
                elif type(f) in self._OPS:
                    self._skip_preds.append((col, self._OPS[type(f)], f.value))
            yield f  # ALWAYS returned: pruning-only, Spark re-applies


@dataclass
class _WroteFile(WriterCommitMessage):
    #: file paths relative to the commit data dir — one per task for
    #: plain writes, one per PARTITION the task saw for hive-
    #: partitioned writes (empty = the task had no rows)
    rels: tuple = ()


class ManifestBatchWriter(DataSourceArrowWriter):
    """Write half of the source: ``df.write.format("manifest_table")``
    with mode append/overwrite publishes ONE manifest version.

    Protocol: each executor task streams its Arrow batches into one
    parquet file inside a private ``data/commit-<token>`` dir and
    reports the filename; the DRIVER's ``commit`` harvests footer
    stats over the dir and publishes the manifest — identical
    semantics to ``manifest.commit`` (same ``_publish_dir`` back
    half), including optimistic retry and schema evolution.  A failed
    job calls ``abort``, which removes the unpublished dir — readers
    can never see it because nothing references it until the publish.

    Options ``txn_app_id`` + ``txn_version`` thread the exactly-once
    writer txn through the SQL write path (replayed jobs become
    no-ops), same contract as ``commit(txn=...)``.

    Option ``partition_by`` (comma-separated columns — the Python
    DataSource API does not receive ``partitionBy()``) writes the
    commit hive-partitioned: each task streams its batches into one
    parquet file PER PARTITION VALUE it sees, under ``col=value/``
    paths with the partition columns stripped from the files (the
    hive layout ``read_version`` and the batch reader already prune
    and reconstruct).  ``mode("overwrite")`` plus option
    ``partition_overwrite_mode=dynamic`` replaces only the partitions
    present in the written data, as one conflict-free version
    (``manifest.publish_dynamic_overwrite``)."""

    def __init__(
        self,
        table_dir: str,
        schema: StructType,
        overwrite: bool,
        txn: tuple[str, int] | None = None,
        partition_by: list[str] | None = None,
        dynamic: bool = False,
    ):
        self.table_dir = table_dir
        self.schema = schema
        self.mode = "overwrite" if overwrite else "append"
        self.txn = txn
        self.partition_by = partition_by or []
        self.dynamic = dynamic
        token = uuid.uuid4().hex[:12]
        self.rel = os.path.join("data", f"commit-{token}")
        self.abs_dir = os.path.join(table_dir, self.rel)

    @staticmethod
    def _fmt_part(v) -> str:
        """One partition value as its hive path component — Spark's
        convention: NULL sentinel dir, everything else str() with
        path-hostile characters percent-escaped (the read side
        unquotes; see ``manifest._parse_partition_value``)."""
        from urllib.parse import quote

        if v is None:
            return "__HIVE_DEFAULT_PARTITION__"
        return quote(str(v), safe="")

    def write(self, iterator) -> _WroteFile:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        os.makedirs(self.abs_dir, exist_ok=True)
        full = to_arrow_schema(self.schema)
        part_cols = self.partition_by
        data_idx = [
            i for i, f in enumerate(full) if f.name not in part_cols
        ]
        target = pa.schema([full.field(i) for i in data_idx])
        #: combo tuple -> (ParquetWriter, rel path); plain writes use
        #: the single () combo — one file per task either way
        writers: dict[tuple, tuple] = {}

        def _sink(combo) -> "pq.ParquetWriter":
            got = writers.get(combo)
            if got is not None:
                return got[0]
            sub = "".join(
                f"{c}={self._fmt_part(v)}{os.sep}"
                for c, v in zip(part_cols, combo)
            )
            rel = f"{sub}part-{uuid.uuid4().hex}.parquet"
            os.makedirs(
                os.path.dirname(os.path.join(self.abs_dir, rel)) or ".",
                exist_ok=True,
            )
            w = pq.ParquetWriter(os.path.join(self.abs_dir, rel), target)
            writers[combo] = (w, rel)
            return w

        try:
            for batch in iterator:
                aligned = pa.RecordBatch.from_arrays(
                    [
                        batch.column(i).cast(full.field(i).type)
                        for i in range(batch.num_columns)
                    ],
                    schema=full,
                )
                if not part_cols:
                    _sink(()).write_batch(
                        aligned.select([f.name for f in target])
                    )
                    continue
                # split the Arrow batch by partition tuple — vectorized
                # masks per distinct combo (combos per batch are few;
                # rows per combo are many — the right split of work)
                import pyarrow.compute as pc

                tbl = pa.Table.from_batches([aligned])
                combos = (
                    tbl.select(part_cols)
                    .group_by(part_cols)
                    .aggregate([])
                    .to_pylist()
                )
                data_tbl = tbl.select([f.name for f in target])
                for row in combos:
                    combo = tuple(row[c] for c in part_cols)
                    mask = None
                    for c, v in zip(part_cols, combo):
                        col = tbl.column(c)
                        m = (
                            pc.is_null(col)
                            if v is None
                            else pc.equal(col, pa.scalar(v, col.type))
                        )
                        mask = m if mask is None else pc.and_kleene(mask, m)
                    part = data_tbl.filter(
                        pc.fill_null(mask, False)
                    )
                    w = _sink(combo)
                    for b in part.to_batches():
                        if b.num_rows:
                            w.write_batch(b)
        finally:
            for w, _ in writers.values():
                w.close()
        return _WroteFile(rels=tuple(rel for _, rel in writers.values()))

    def commit(self, messages) -> None:
        # harvest ONLY the files the successful task attempts named:
        # a failed/retried/speculative attempt may have left a partial
        # or duplicate part-* file in the dir, which must not enter
        # the manifest (it stays unreferenced — readers never see it,
        # and the file-granular vacuum reclaims it after retention)
        entries = [
            M._harvest_one(self.abs_dir, rel)
            for m in messages
            if m is not None
            for rel in m.rels
        ]
        os.makedirs(self.abs_dir, exist_ok=True)  # 0-row writes
        entries = sorted(entries, key=lambda e: e["path"])
        if self.dynamic:
            M.publish_dynamic_overwrite(
                self.table_dir,
                self.rel,
                entries,
                self.schema,
                self.partition_by,
                txn=self.txn,
            )
            return
        M._publish_dir(
            self.table_dir,
            self.rel,
            entries,
            self.schema,
            self.mode,
            partition_by=self.partition_by or None,
            txn=self.txn,
        )

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.abs_dir, ignore_errors=True)


class ManifestStreamReader(DataSourceStreamReader):
    """Streaming half of the source; see the module docstring for the
    offset model (version numbers = offsets, a version is an immutable
    file set).

    ADMISSION CONTROL (``max_files_per_trigger`` /
    ``max_bytes_per_trigger``): without caps, a restarted stream
    facing an N-version backlog gets it as ONE arbitrarily large
    micro-batch — at 100 TB that is an OOM, not a slowdown, which is
    why every public lakehouse stream source rate-limits admission
    (Delta maxFilesPerTrigger / maxBytesPerTrigger semantics).  With a
    cap set, ``latestOffset`` walks forward from the last planned
    position and admits whole FILES until the cap is reached (always
    at least one file per batch, so a single file larger than
    ``max_bytes_per_trigger`` still flows; bytes are a soft max, files
    a hard max).  Versions split mid-way extend the offset to
    ``{"version": v, "index": i}`` — "the first i files of version
    v's appended dirs are consumed" — with the file order pinned by
    the manifest (dirs in manifest order, entries in immutable shard
    order), so a replayed batch re-reads the same files bit-for-bit
    and exactly-once is preserved.  Plain ``{"version": v}`` (old
    checkpoints, uncapped runs) means "consumed THROUGH v" — capped
    and uncapped runs interoperate on one checkpoint.

    Position tracking across restarts: the engine implements
    ``AcceptsLatestSeenOffset`` for Python sources by probing
    ``partitions(checkpointed, checkpointed)`` before the first
    ``latestOffset`` of a restarted run, so the reader always knows
    where the previous run left off; a fresh query learns it from
    ``initialOffset``.  Belt and braces: with no known position the
    reader admits everything (correct, merely unbounded).

    Caveat: ``Trigger.AvailableNow`` pins the FIRST ``latestOffset``
    as the whole run's end offset (the engine-side wrapper for
    sources without native AvailableNow support), so a capped stream
    run that way processes exactly one capped batch and stops.  For
    "drain the backlog in bounded batches, then stop" (Delta's
    maxFilesPerTrigger-under-availableNow semantics) use ``drain()``
    below; for long-lived streams use the default / processingTime
    trigger (each trigger advances the cap window)."""

    def __init__(
        self,
        table_dir: str,
        schema: StructType,
        starting_version: int = 0,
        max_files: int | None = None,
        max_bytes: int | None = None,
    ):
        self.table_dir = table_dir
        self.schema = schema
        self.starting_version = starting_version
        self.max_files = max_files
        self.max_bytes = max_bytes
        #: last planned/committed offset dict — set by initialOffset,
        #: partitions (incl. the engine's restart probe) and commit
        self._pos: dict | None = None
        #: version -> validated ordered file list [(abs_path, bytes)]
        self._steps: OrderedDict = OrderedDict()

    # -------------------------------------------------- version steps

    def _step_files(self, v: int) -> list:
        """The ordered [(abs_path, bytes)] list version ``v`` appended,
        validated for streamability (append-only mode, unchanged
        tombstones, no hive partitioning, unchanged schema).  The
        order is pinned by the manifest — dirs in manifest order,
        entries in immutable shard order — so every caller (admission
        walk, batch planning, replay after restart) sees the same
        sequence."""
        hit = self._steps.get(v)
        if hit is not None:
            self._steps.move_to_end(v)
            return hit
        m = _read_manifest_safe(self.table_dir, v)
        prev_dirs: set = set()
        prev_n_deletes = 0
        if v > 1:
            pm = _read_manifest_safe(self.table_dir, v - 1)
            prev_dirs = set(pm["dirs"])
            prev_n_deletes = len(pm.get("deletes", []))
        # 'set_constraint' versions are metadata-only (no dirs added,
        # no tombstone change — both re-proven below), so the stream
        # passes through them with zero new partitions
        if m.get("mode") not in ("append", "set_constraint", "set_bloom"):
            raise ValueError(
                f"version {v} is mode={m.get('mode')!r}: only "
                "append-only tables stream; use changefeed_rows + "
                "the CDC sink for rewrites/deletes/updates"
            )
        if len(m.get("deletes", [])) != prev_n_deletes:
            # belt and braces against manifests published by writers
            # predating the distinct 'update'/'delete' modes: a version
            # whose tombstone list changed is not an append no matter
            # what its mode field claims — streaming its new dir as
            # plain inserts would leave consumers holding the stale
            # pre-update copies
            raise ValueError(
                f"version {v} changed the tombstone list: only "
                "append-only tables stream; use changefeed_rows + "
                "the CDC sink for rewrites/deletes/updates"
            )
        new_dirs = [d for d in m["dirs"] if d not in prev_dirs]
        part_dirs = m.get("partitioned_dirs", {})
        dir_schemas = M._load_dir_schemas(m)
        # column mapping is constant across streamable versions (a
        # rename is mode='set_schema', rejected above), so files store
        # these physical names in the stream schema's logical order
        mapping = M._load_mapping(m)[0]
        phys_names = (
            [mapping.get(f.name, f.name) for f in self.schema.fields]
            if mapping
            else None
        )
        files: list = []
        for d in new_dirs:
            if d in part_dirs:
                raise ValueError(
                    f"dir {d} is hive-partitioned: leaf files do "
                    "not carry the partition columns; stream the "
                    "changefeed instead"
                )
            sj = dir_schemas.get(d)
            if sj is not None and [
                (f.name, f.dataType)
                for f in StructType.fromJson(sj).fields
            ] != [
                (mapping.get(f.name, f.name), f.dataType)
                for f in self.schema.fields
            ]:
                raise ValueError(
                    f"dir {d} was committed with a different "
                    "schema than the stream started with; "
                    "restart the stream to pick up the evolution"
                )
            for e in M._dir_entries(self.table_dir, m, d) or []:
                p = os.path.join(self.table_dir, d, e["path"])
                nb = e.get("bytes")
                if nb is None:  # entry predates byte records
                    nb = os.path.getsize(p)
                files.append((p, nb, phys_names))
        self._steps[v] = files
        if len(self._steps) > 256:
            self._steps.popitem(last=False)
        return files

    @staticmethod
    def _key(off: dict) -> tuple:
        """Total order over offsets: {"version": v} (all of v
        consumed) sorts after every partial {"version": v, "index":
        i} of the same version."""
        i = off.get("index")
        return (int(off["version"]), float("inf") if i is None else int(i))

    def _advance(self, off: dict) -> None:
        """Track the furthest position ever planned/committed —
        monotone, so an engine-side replay of an old batch can never
        drag the admission floor backwards."""
        if self._pos is None or self._key(off) > self._key(self._pos):
            self._pos = dict(off)

    @staticmethod
    def _offset(version: int, index) -> dict:
        """Canonical offset dict — key order is fixed because the
        engine round-trips offsets as JSON strings; 'fully consumed'
        is always the plain {"version": v} form so capped and
        uncapped runs agree on one representation per position."""
        if index is None:
            return {"version": version}
        return {"version": version, "index": index}

    # ------------------------------------------------ offset protocol

    def initialOffset(self) -> dict:
        self._advance({"version": self.starting_version})
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        tip = M.latest_version(self.table_dir)
        if self.max_files is None and self.max_bytes is None:
            return {"version": tip}
        # the engine calls latestOffset BEFORE initialOffset on a
        # fresh query, so an unknown position means exactly that: a
        # fresh query, whose floor is starting_version.  A RESTARTED
        # query always probes partitions(ckpt, ckpt) first
        # (AcceptsLatestSeenOffset), which sets the position.
        pos = self._pos or {"version": self.starting_version}
        pv, pi = int(pos["version"]), pos.get("index")
        n_files = 0
        n_bytes = 0
        end_v, end_i = pv, pi
        # resume point: mid-version when the position carries an index,
        # else the next version
        v, j = (pv, int(pi)) if pi is not None else (pv + 1, 0)
        while v <= tip:
            files = self._step_files(v)
            total = len(files)
            while j < total:
                nb = files[j][1]
                over_f = (
                    self.max_files is not None
                    and n_files + 1 > self.max_files
                )
                over_b = (
                    self.max_bytes is not None
                    and n_bytes + nb > self.max_bytes
                )
                if n_files > 0 and (over_f or over_b):
                    return self._offset(end_v, end_i)
                n_files += 1
                n_bytes += nb
                j += 1
                end_v, end_i = v, (j if j < total else None)
            end_v, end_i = v, None  # version drained (or had no files)
            v += 1
            j = 0
        return self._offset(end_v, end_i)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        a, ia = int(start["version"]), start.get("index")
        b, ib = int(end["version"]), end.get("index")
        if self._key(end) < self._key(start):
            # belt and braces: planning a batch that moves backwards
            # would re-emit consumed files as duplicates — refuse
            raise ValueError(
                f"offset regression: batch ({start}, {end}] ends "
                "before it starts; the checkpoint and the table "
                "history disagree"
            )
        self._advance(end)
        if (a, ia) == (b, ib):
            # degenerate range — includes the engine's restart probe
            # partitions(checkpointed, checkpointed), which exists to
            # hand the reader its position (recorded above)
            return [_FilePart("")]
        parts: list = []
        if ia is not None:
            files = self._step_files(a)
            hi = (
                len(files)
                if a < b
                else int(ib) if ib is not None else len(files)
            )
            parts.extend(_FilePart(p, pn) for p, _, pn in files[int(ia):hi])
        for w in range(a + 1, b + 1):
            files = self._step_files(w)
            hi = len(files) if (w < b or ib is None) else int(ib)
            parts.extend(_FilePart(p, pn) for p, _, pn in files[:hi])
        return parts if parts else [_FilePart("")]

    def read(self, part: _FilePart) -> Iterator:
        if not part.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        names = self.schema.fieldNames()
        phys = part.phys_names or names
        pf = pq.ParquetFile(part.path)
        for batch in pf.iter_batches():
            # project to the declared column order (parquet files may
            # store columns in any order; renamed columns live under
            # their physical names) and ship Arrow batches straight
            # through — no per-row Python
            sel = batch.select(phys)
            if phys is not names:
                sel = pa.RecordBatch.from_arrays(
                    [sel.column(i) for i in range(sel.num_columns)],
                    names=names,
                )
            yield sel

    def commit(self, end: dict) -> None:
        # offsets are version (+ optional intra-version file index)
        # positions; nothing external to ack — but remember where the
        # engine got to: the admission walk's floor
        self._advance(end)


# --------------------------------------------------------------------
# Bounded drain-then-stop (AvailableNow x admission control)
# --------------------------------------------------------------------


def drain(
    spark,
    table_dir: str,
    writer,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | str | None = None,
    starting_version: int | str | None = None,
    transform=None,
    max_batches: int | None = None,
    timeout_secs: float = 600.0,
    poll_secs: float = 0.1,
) -> dict:
    """Drain a manifest-table backlog in BOUNDED micro-batches, then
    stop — ``Trigger.AvailableNow`` semantics composed with admission
    control, which the engine-side AvailableNow wrapper for Python
    sources cannot express (it pins the FIRST ``latestOffset`` as the
    run's end, so a capped stream run that way processes exactly one
    capped batch; see ``ManifestStreamReader``).  This is Delta's
    "maxFilesPerTrigger under availableNow" shape: the most common
    lakehouse ingest pattern — catch up on whatever landed since the
    last run without ever materializing the whole backlog as one
    micro-batch — run as a helper loop instead of a trigger.

    The TIP IS PINNED at call time: versions committed while the
    drain runs are left for the next call, exactly like AvailableNow.
    Exactly-once across restarts/kills rides the source's offset
    model (version+index offsets, bit-identical replays) plus the
    sink's own idempotence — interrupt the drain anywhere and calling
    it again with the same checkpoint resumes, never replays into a
    committed sink twice.

    Args:
        writer: callable ``(streaming DataFrame) -> DataStreamWriter``
            — configure format/options/foreachBatch, NOT the trigger
            or checkpointLocation (the drain owns those).
        transform: optional ``(DataFrame) -> DataFrame`` applied
            between source and writer.
        max_batches: stop once at least this many DATA micro-batches
            have committed this call (bounded work per run; the next
            call resumes from the checkpoint).  The query free-runs
            while the drain polls, so a batch or two more may commit
            while stopping — each is still exactly-once.
        starting_version: forwarded to the source on a FRESH
            checkpoint (ignored once the checkpoint has offsets).

    Returns dict: ``batches`` (data micro-batches this call),
    ``tip`` (the pinned end version), ``reached_tip`` (False only
    when ``max_batches``/interruption stopped the drain early).
    """
    import json
    import time

    spark.dataSource.register(ManifestTableDataSource)
    tip = M.latest_version(table_dir)
    reader = spark.readStream.format("manifest_table").option(
        "table_dir", table_dir
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "max_files_per_trigger", str(max_files_per_trigger)
        )
    if max_bytes_per_trigger is not None:
        reader = reader.option(
            "max_bytes_per_trigger", str(max_bytes_per_trigger)
        )
    if starting_version is not None:
        reader = reader.option("starting_version", str(starting_version))
    df = reader.load()
    if transform is not None:
        df = transform(df)
    q = (
        writer(df)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )

    def _end_key(progress) -> tuple | None:
        try:
            eo = progress["sources"][0]["endOffset"]
        except (KeyError, IndexError, TypeError):
            return None
        if eo is None:
            return None
        if isinstance(eo, str):
            try:
                eo = json.loads(eo)
            except json.JSONDecodeError:
                # the engine may surface the Python offset dict's repr
                import ast

                eo = ast.literal_eval(eo)
        return ManifestStreamReader._key(eo)

    target = (tip, float("inf"))
    n_data_batches = 0
    seen_batch_ids: set = set()
    reached = tip == 0
    deadline = time.monotonic() + timeout_secs
    try:
        while True:
            if q.exception() is not None:
                raise q.exception()
            for p in q.recentProgress:
                bid = p.get("batchId")
                if bid in seen_batch_ids:
                    continue
                seen_batch_ids.add(bid)
                if p.get("numInputRows", 0) > 0:
                    n_data_batches += 1
                k = _end_key(p)
                if k is not None and k >= target:
                    reached = True
            if reached:
                break
            if max_batches is not None and n_data_batches >= max_batches:
                break
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"drain of {table_dir} did not reach v{tip} in "
                    f"{timeout_secs}s ({n_data_batches} data batches "
                    "completed)"
                )
            time.sleep(poll_secs)
    finally:
        q.stop()
        q.awaitTermination(120)
    return {"batches": n_data_batches, "tip": tip, "reached_tip": reached}
