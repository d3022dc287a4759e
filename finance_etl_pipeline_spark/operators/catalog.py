"""Warehouse catalog: NAME → table-dir resolution for manifest tables
— the first thing a multi-user deployment needs once tables stop
being filesystem paths (Delta's metastore / Iceberg's catalog role,
minimally).

Storage is a versioned JSON map under ``<root>/_catalog/``, published
with the SAME protocol as the manifest log (operators/manifest.py::
_publish): compose against the tip, write a private temp file, and
``os.link`` it to ``v{n}.json`` — link(2) fails like O_EXCL when the
version exists, so two concurrent CREATEs serialize by
optimistic-concurrency retry and a lost CREATE of the same name
aborts loudly against the winner's snapshot instead of silently
overwriting the mapping.  Every catalog version is the FULL map
(tiny by construction — a map of names), so reads are one file and
history is free.

Managed vs external: a table created without ``location`` lives under
``<root>/<name>`` (managed — DROP PURGE deletes its data); a table
registered at an explicit location outside the root is external —
DROP only ever unregisters it (the Delta/Hive contract).

Reference parity: the reference pipeline addresses data by
constructor-injected paths (src/pipeline.py); a catalog has no
counterpart there — this follows the public lakehouse-catalog shape.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

_CATALOG = "_catalog"
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class CatalogError(ValueError):
    """Name not found / invalid, or a refused DROP."""


class TableExistsError(CatalogError):
    """CREATE of a name the catalog already maps."""


def _cat_dir(root: str) -> str:
    return os.path.join(root, _CATALOG)


def _version_path(root: str, v: int) -> str:
    return os.path.join(_cat_dir(root), f"v{v:08d}.json")


def _latest_version(root: str) -> int:
    d = _cat_dir(root)
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return 0
    best = 0
    for n in names:
        if n.startswith("v") and n.endswith(".json"):
            try:
                best = max(best, int(n[1:-5]))
            except ValueError:
                pass
    return best


def _read(root: str, v: int) -> dict:
    with open(_version_path(root, v)) as fh:
        return json.load(fh)


def _snapshot(root: str) -> dict:
    v = _latest_version(root)
    snap = _read(root, v) if v else {"version": 0, "tables": {}}
    snap.setdefault("views", {})  # pre-view catalogs read as view-free
    return snap


def _publish(root: str, build) -> int:
    """``build(tables: dict, views: dict) -> (tables, views, op)`` —
    same retry/link CAS as the manifest log; build is re-invoked
    against the winner's snapshot on a lost race.  Tables and views
    share one atomic snapshot, so cross-namespace collision checks
    (a view may not shadow a table and vice versa) are race-free."""
    os.makedirs(_cat_dir(root), exist_ok=True)
    while True:
        prev = _latest_version(root)
        snap = _read(root, prev) if prev else {"tables": {}}
        snap.setdefault("views", {})
        tables, views, op = build(
            dict(snap["tables"]), dict(snap["views"])
        )
        payload = {
            "version": prev + 1,
            "ts": time.time(),
            "op": op,
            "tables": tables,
            "views": views,
        }
        tmp = os.path.join(_cat_dir(root), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        try:
            os.link(tmp, _version_path(root, prev + 1))
        except FileExistsError:
            continue  # lost the race: recompose against the new tip
        finally:
            os.unlink(tmp)
        return prev + 1


def _to_abs(root: str, stored: str) -> str:
    return (
        stored
        if os.path.isabs(stored)
        else os.path.join(root, stored)
    )


def _validate_name(name: str) -> None:
    if not _NAME_RE.match(name or ""):
        raise CatalogError(
            f"invalid table name {name!r} (want [A-Za-z_][A-Za-z0-9_]*)"
        )
    if name.startswith("_"):
        raise CatalogError(
            f"invalid table name {name!r}: the leading-underscore "
            "namespace is reserved for warehouse internals "
            "(a managed table named '_catalog' would collide with "
            "the catalog's own storage)"
        )


def create_table(
    root: str, name: str, location: str | None = None
) -> str:
    """Register ``name``; returns the ABSOLUTE table dir.  Managed
    tables (no ``location``) live at ``<root>/<name>`` and store a
    root-relative dir so the warehouse can be moved wholesale;
    ``location`` registers an external path verbatim.  The dir is NOT
    created or written here — this is the CREATE-then-INSERT shape
    (use ``create_table_as`` for CTAS)."""
    _validate_name(name)
    stored = name if location is None else os.path.abspath(location)

    def build(tables: dict, views: dict):
        if name in tables:
            raise TableExistsError(
                f"table {name!r} already exists at "
                f"{_to_abs(root, tables[name]['dir'])}"
            )
        if name in views:
            raise TableExistsError(
                f"{name!r} already names a VIEW (tables and views "
                "share one namespace); DROP VIEW it first"
            )
        tables[name] = {"dir": stored, "created_ts": time.time()}
        return tables, views, f"create {name}"

    _publish(root, build)
    return _to_abs(root, stored)


def create_table_as(
    spark,
    root: str,
    name: str,
    df,
    partition_by: list[str] | None = None,
) -> tuple[str, int]:
    """CTAS: claim the NAME first (losing a name race aborts before
    any data is written), then commit ``df`` as the table's v1.
    Returns (table_dir, manifest version).  A reader resolving the
    name in the claim→commit window sees a table with no versions —
    the same window CREATE-then-INSERT exposes."""
    from finance_etl_pipeline_spark.operators import manifest as M

    tdir = create_table(root, name)
    try:
        v = M.commit(df, tdir, partition_by=partition_by)
    except BaseException:
        # roll the claim back so a failed CTAS is retryable
        try:
            drop_table(root, name, purge=False, force=True)
        except CatalogError:
            pass
        raise
    return tdir, v


def resolve(root: str, name: str) -> str:
    """ABSOLUTE table dir for ``name``; CatalogError when unknown."""
    snap = _snapshot(root)
    ent = snap["tables"].get(name)
    if ent is None:
        raise CatalogError(
            f"unknown table {name!r} (have: "
            f"{sorted(snap['tables']) or 'none'})"
        )
    return _to_abs(root, ent["dir"])


def show_tables(root: str) -> list[dict]:
    """[{name, dir, managed}] sorted by name — ``dir`` absolute."""
    snap = _snapshot(root)
    out = []
    for name, ent in sorted(snap["tables"].items()):
        out.append(
            {
                "name": name,
                "dir": _to_abs(root, ent["dir"]),
                "managed": not os.path.isabs(ent["dir"]),
            }
        )
    return out


def _sweep_trash(root: str, retention_seconds: float = 3600.0) -> None:
    """Reclaim ``.trash-*`` dirs a crashed PURGE left behind — only
    those older than ``retention_seconds``, so an IN-FLIGHT drop's
    freshly-renamed trash (rename → publish → rmtree window) is never
    swept out from under it."""
    import shutil

    now = time.time()
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    for n in names:
        if not n.startswith(".trash-"):
            continue
        p = os.path.join(root, n)
        try:
            if now - os.path.getmtime(p) >= retention_seconds:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass


def drop_table(
    root: str, name: str, purge: bool = False, force: bool = False
) -> None:
    """Unregister ``name``.  A MANAGED table holding data refuses
    without ``purge=True`` (which deletes its directory tree); an
    external table is only ever unregistered — its data is not ours
    to delete.  ``force`` skips the data check (internal: CTAS
    rollback).

    PURGE protocol: the managed directory is atomically RENAMED to a
    ``.trash-<uuid>`` sibling BEFORE the unregister publishes, then
    the trash is deleted after.  An rmtree-after-publish would race a
    concurrent ``create_table`` of the same name (which re-registers
    ``<root>/<name>``): the rmtree could delete the NEW table's
    directory out from under it.  After the rename the path is vacant,
    and the name stays registered until the publish, so no creator can
    share the doomed directory.  ``.trash-*`` can never collide with a
    table name (names must start with a letter/underscore and
    leading-underscore is reserved).

    Crash window: a kill between the rename and the publish leaves the
    name registered with a vacant directory (it reads as an EMPTY
    table — ``create_table`` never pre-creates dirs, so readers handle
    a vacant managed path by construction) and the data parked in
    ``.trash-*``; recover by renaming the trash back, or drop again.
    A janitor sweep at the start of every drop reclaims trash older
    than an hour, so an abandoned window never leaks disk forever."""
    from finance_etl_pipeline_spark.operators import manifest as M

    _sweep_trash(root)
    trash = purged_dir = None
    if purge:
        snap = _snapshot(root)
        ent = snap["tables"].get(name)
        if ent is not None and not os.path.isabs(ent["dir"]):
            purged_dir = _to_abs(root, ent["dir"])
            trash = os.path.join(root, f".trash-{uuid.uuid4().hex}")
            try:
                os.rename(purged_dir, trash)
                # rename keeps the (possibly old) dir mtime — stamp it
                # NOW so the janitor's retention window protects this
                # in-flight drop from a concurrent sweep
                os.utime(trash, None)
            except FileNotFoundError:
                trash = None  # never written: nothing to purge

    def build(tables: dict, views: dict):
        ent = tables.pop(name, None)
        if ent is None:
            raise CatalogError(f"unknown table {name!r}")
        managed = not os.path.isabs(ent["dir"])
        if managed and not purge and not force:
            tdir = _to_abs(root, ent["dir"])
            if os.path.isdir(tdir) and M.latest_version(tdir) > 0:
                raise CatalogError(
                    f"table {name!r} holds data (v"
                    f"{M.latest_version(tdir)}); DROP TABLE {name} "
                    "PURGE to delete it, or drop_table(purge=True)"
                )
        return tables, views, f"drop {name}"

    try:
        _publish(root, build)
    except BaseException:
        if trash is not None:
            # the drop lost (e.g. a concurrent drop won the name):
            # put the data back where the mapping pointed
            try:
                os.rename(trash, purged_dir)
            except OSError:
                pass  # concurrent dropper moved it first
        raise
    if trash is not None:
        import shutil

        shutil.rmtree(trash, ignore_errors=True)


def rename_table(root: str, old: str, new: str) -> None:
    """Rename the catalog entry — metadata only; the table DIRECTORY
    is untouched (a managed dir keeps its original path, like a Hive
    managed rename without the data move; readers resolving the old
    name fail loudly from the rename's publish on).  Refuses unknown
    ``old`` and an already-mapped ``new`` atomically against the tip."""
    _validate_name(new)

    def build(tables: dict, views: dict):
        if old not in tables:
            raise CatalogError(f"unknown table {old!r}")
        if new in tables:
            raise TableExistsError(
                f"table {new!r} already exists at "
                f"{_to_abs(root, tables[new]['dir'])}"
            )
        if new in views:
            raise TableExistsError(
                f"{new!r} already names a VIEW (tables and views "
                "share one namespace)"
            )
        tables[new] = tables.pop(old)
        return tables, views, f"rename {old} -> {new}"

    _publish(root, build)


# ------------------------------------------------------------------ views


_WORD_RE = re.compile(r"\b[A-Za-z_][A-Za-z0-9_]*\b")


def _view_refs(sql: str, view_names) -> set[str]:
    """View names a SELECT references, by word-token scan.  Tokens
    inside string literals and backticked identifiers are excluded
    (operators/sqltext.py — the SAME masker the DML lexer uses);
    anything else that MATCHES a registered view name counts —
    over-approximate on purpose, since a false positive only tightens
    the cycle check."""
    from finance_etl_pipeline_spark.operators.sqltext import mask_quotes

    toks = set(_WORD_RE.findall(mask_quotes(sql)))
    return toks & set(view_names)


def create_view(
    root: str, name: str, sql: str, or_replace: bool = False
) -> None:
    """Persist ``name`` as a catalog VIEW over the given SELECT text
    (the shared-SELECT shape: the reference re-derives the same
    month-filter/margin pipeline in three scripts — reference
    scripts/export_bi_datasets.py:37-55, export_powerbi_star_schema
    .py:60-68, build_dashboard.py:53-71; a view states it once).

    The SQL is stored VERBATIM and expands at read time (CLI ``sql``
    registers every catalog view as a Spark temp view over the
    resolved tables), so a view always reflects the CURRENT table
    state.  Semantic validation (do the referenced columns exist?)
    happens where a SparkSession exists — ``sqldml.execute_ddl`` runs
    the SELECT once at CREATE; this layer enforces name validity,
    namespace uniqueness against tables AND views, and rejects
    circular references (a view reachable from itself through the
    stored texts) atomically against the snapshot."""
    _validate_name(name)

    def build(tables: dict, views: dict):
        if name in tables:
            raise TableExistsError(
                f"{name!r} already names a TABLE (tables and views "
                "share one namespace)"
            )
        if name in views and not or_replace:
            raise TableExistsError(
                f"view {name!r} already exists; use CREATE OR REPLACE "
                "VIEW to redefine it"
            )
        candidate = dict(views)
        candidate[name] = {"sql": sql, "created_ts": time.time()}
        # cycle check over the stored texts: any path from this view
        # back to itself (including a direct self-reference) is
        # circular — there is no recursive-view semantics here
        seen, stack = set(), [name]
        while stack:
            cur = stack.pop()
            for ref in sorted(
                _view_refs(candidate[cur]["sql"], candidate)
            ):
                if ref == name:
                    raise CatalogError(
                        f"view {name!r} would be circular: "
                        f"{cur!r} references {ref!r}"
                    )
                if ref not in seen:
                    seen.add(ref)
                    stack.append(ref)
        return tables, candidate, f"create view {name}"

    _publish(root, build)


def drop_view(root: str, name: str) -> None:
    def build(tables: dict, views: dict):
        if name not in views:
            raise CatalogError(
                f"unknown view {name!r} (have: "
                f"{sorted(views) or 'none'})"
            )
        del views[name]
        return tables, views, f"drop view {name}"

    _publish(root, build)


def show_views(root: str) -> list[dict]:
    """[{name, sql}] sorted by name."""
    snap = _snapshot(root)
    return [
        {"name": n, "sql": ent["sql"]}
        for n, ent in sorted(snap["views"].items())
    ]


def view_sql(root: str, name: str) -> str:
    snap = _snapshot(root)
    ent = snap["views"].get(name)
    if ent is None:
        raise CatalogError(
            f"unknown view {name!r} (have: "
            f"{sorted(snap['views']) or 'none'})"
        )
    return ent["sql"]
