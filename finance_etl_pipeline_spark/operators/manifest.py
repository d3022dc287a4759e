"""Versioned tables on plain Parquet — a minimal manifest log giving
time travel, snapshot isolation, and safe vacuum without a table
format dependency.

Layout under the table root:

    data/commit-<version>-<token>/part-*.parquet   immutable data dirs
    _manifests/v<00000N>.json                      one snapshot per version

A manifest lists the data directories composing that version, so a
version is an immutable FILE SET: readers resolve one manifest and
never see a torn state; writers add new data dirs and publish the next
manifest; nothing is mutated in place.  Publication is atomic via
exclusive-create of the manifest file (O_EXCL), which doubles as
optimistic concurrency control — two concurrent committers race for
v(N+1); the loser re-reads and retries at v(N+2), exactly the
commit-protocol shape of the big table formats, reduced to its core.

Scale posture: a manifest is O(#data dirs) of JSON — the driver-side
metadata path; the data path is untouched parquet (all pushdown /
skipping behavior preserved since ``read_version`` is a plain
``spark.read.parquet`` over the listed dirs).  On object stores
without atomic create, swap the O_EXCL publish for a conditional PUT
(if-none-match) — the one primitive this protocol needs.

Relationship to siblings: ``operators/compact.py`` rewrites files
in place (crash-safe swap); committing the compacted files as a new
VERSION here keeps old snapshots readable until ``vacuum``.
``operators/diff.py::table_diff`` between two versions is the audit.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFESTS, f"v{version:06d}.json")


def latest_version(table_dir: str) -> int:
    """Highest published version, or 0 if the table is empty."""
    mdir = os.path.join(table_dir, _MANIFESTS)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:7])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def _publish(table_dir: str, build_payload) -> int:
    """Atomically publish the next manifest.  ``build_payload(prev)``
    composes the snapshot against tip version ``prev`` and is
    RE-INVOKED on every retry: a committer that loses the
    exclusive-create race must recompose against the winner's
    manifest, or the winner's files would be silently dropped from
    the lineage (the classic optimistic-concurrency lost update)."""
    os.makedirs(os.path.join(table_dir, _MANIFESTS), exist_ok=True)
    while True:
        prev = latest_version(table_dir)
        payload = build_payload(prev)
        payload["version"] = prev + 1
        # Atomic CONTENT publication: the payload is fully written to a
        # private temp file first, then hard-linked to the manifest
        # path.  link(2) fails like O_EXCL when the target exists (the
        # optimistic-concurrency race) but — unlike create-then-write —
        # never exposes an empty/partial manifest to a concurrent
        # reader that resolves latest_version() in the window between
        # claim and write.
        tmp = os.path.join(
            table_dir, _MANIFESTS, f".tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        try:
            os.link(tmp, _manifest_path(table_dir, prev + 1))
        except FileExistsError:
            continue  # lost the race — recompose against the new tip
        finally:
            os.unlink(tmp)
        return prev + 1


def commit(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Write ``df`` as immutable data files and publish the next
    version.  ``mode='append'`` extends the previous file set;
    ``mode='overwrite'`` starts a fresh set (old versions stay
    readable until vacuum)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    token = uuid.uuid4().hex[:12]
    # data dir name carries no version: the version is assigned at
    # publish time, after the (possibly contended) race
    rel = os.path.join(_DATA, f"commit-{token}")
    df.write.parquet(os.path.join(table_dir, rel))

    def build(prev: int) -> dict:
        dirs = (
            []
            if mode == "overwrite" or prev == 0
            else list(_read_manifest(table_dir, prev)["dirs"])
        )
        dirs.append(rel)
        return {"dirs": dirs, "mode": mode}

    return _publish(table_dir, build)


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: latest) — a plain parquet
    read over that snapshot's immutable file set."""
    v = latest_version(table_dir) if version is None else version
    m = _read_manifest(table_dir, v)
    paths = [os.path.join(table_dir, d) for d in m["dirs"]]
    return spark.read.parquet(*paths)


def vacuum(
    table_dir: str,
    keep_last: int = 1,
    retention_seconds: float = 3600.0,
) -> list[str]:
    """Delete data dirs referenced only by expired versions (older
    than the ``keep_last`` most recent) and drop their manifests.
    Returns the removed data dirs.  Readers of retained versions are
    unaffected — their file sets are intact by construction.

    ``retention_seconds`` protects IN-FLIGHT commits: ``commit``
    writes its data dir BEFORE publishing the manifest, so an
    unreferenced dir younger than the threshold may belong to a commit
    that has not published yet — deleting it would make that commit
    publish a manifest over vanished files.  Only dirs whose mtime is
    older than the threshold are removed (the ``RETAIN n HOURS``
    semantics of the big table formats); pass 0 only when no writer
    can be concurrent.  A never-committed table vacuums to []."""
    tip = latest_version(table_dir)
    if tip == 0:
        return []
    keep = set(range(max(1, tip - keep_last + 1), tip + 1))
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(table_dir, v)["dirs"])
    removed = []
    now = time.time()
    data_root = os.path.join(table_dir, _DATA)
    for d in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        rel = os.path.join(_DATA, d)
        path = os.path.join(data_root, d)
        if rel not in live and now - os.path.getmtime(path) >= retention_seconds:
            shutil.rmtree(path)
            removed.append(rel)
    mdir = os.path.join(table_dir, _MANIFESTS)
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json") and int(f[1:7]) not in keep:
            os.remove(os.path.join(mdir, f))
    return removed


def changes(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Changefeed between two versions — the ``table_changes()`` API
    of the big formats, composed from this log + the snapshot diff:
    every key classified added / removed / changed / unchanged between
    the two immutable file sets.  Cost: one ``table_diff`` (key-hash
    shuffle) over the two snapshot reads; for sparse drift, route
    through ``diff.reconcile`` instead to touch only divergent
    buckets."""
    from finance_etl_pipeline_spark.operators.diff import table_diff

    old = read_version(spark, table_dir, from_version)
    new = read_version(spark, table_dir, to_version)
    return table_diff(old, new, keys)
