"""SQL DML statements over manifest tables — UPDATE / DELETE / MERGE
INTO as text, dispatched onto the versioned-table operators
(``operators/manifest.py``): the statement surface every lakehouse
this layer emulates (Delta, Iceberg) exposes, so a data engineer can
write ``MERGE INTO t USING s ON ...`` instead of reaching for the
Python API.

Deliberately NOT a full ANSI parser: the verb, the clause skeleton,
and the WHERE conjunction are parsed here (small, loud, predictable);
every EXPRESSION inside them — SET right-hand sides, MERGE source
subqueries — is handed to Spark SQL verbatim, so the expression
language is exactly Spark's.  The supported subset maps 1:1 onto what
the manifest log can execute as one atomic version:

* ``DELETE FROM t WHERE <simple conjunction>`` →
  ``delete_where`` (metadata-only merge-on-read tombstone).  The
  predicate must be ``col op literal`` terms joined by AND (plus
  IS [NOT] NULL / IN), because the tombstone is STORED as those
  triples and re-proven against file stats on every read — an
  arbitrary expression could not be.
* ``UPDATE t SET col = <any spark expr>, ... WHERE <conjunction>`` →
  ``update_where`` (one version: scoped tombstone + rewritten rows).
* ``ALTER TABLE t ADD CONSTRAINT name CHECK (<any spark expr>)`` /
  ``ALTER TABLE t DROP CONSTRAINT name`` →
  ``add_constraint`` / ``drop_constraint`` (validated against the
  existing data on ADD; every later write validates inside its
  publish).
* ``INSERT INTO t <select | VALUES ...>`` / ``INSERT OVERWRITE t
  <select>`` → ``commit`` (append inherits a uniformly-partitioned
  table's hive layout; by-name column matching; optional ``txn``);
* ``OPTIMIZE t [WHERE <conjunction>] [ZORDER BY (c, ...)]`` →
  ``compact_table`` / scoped ``compact_where``;
* ``VACUUM t [RETAIN n HOURS] [KEEP LAST k] [DRY RUN]`` → ``vacuum``;
* ``DESCRIBE HISTORY t`` → ``history()``; ``DESCRIBE DETAIL t`` →
  ``describe_detail()``;
* ``RESTORE TABLE t TO VERSION AS OF n | TIMESTAMP AS OF 'ts'`` →
  ``restore_table`` (rollback as a new history-preserving version);
* SELECT-side time travel (``FROM t VERSION AS OF n`` / ``TIMESTAMP
  AS OF 'ts'`` / ``t@n``) via ``expand_time_travel`` — also expanded
  inside INSERT/CTAS payloads and MERGE subquery sources;
* ``COPY INTO t FROM '<dir|glob>' [PATTERN = '<glob>']`` →
  ``copy_into`` (idempotent ingestion: load-history dedup by source
  path, re-running the statement is a no-op);
* ``SHOW PARTITIONS t [VERSION AS OF n | @n]`` →
  ``table_partitions`` (metadata-only inventory with exact counts);
* ``CONVERT TO MANIFEST '<parquet dir>' AS t`` → ``convert_parquet``
  (zero-copy in-place adoption of an existing parquet directory);
* metadata-only aggregates (``try_metadata_select``): a SELECT whose
  whole list is count(*)/count(c)/min(c)/max(c) over ONE table —
  optionally WHERE partition-equality conjuncts and/or GROUP BY
  partition columns — answers from manifest stats, bit-exact parity
  with spark.sql or it declines to the scan;
* ``MERGE INTO t [AS a] USING <view | (subquery)> [AS b]
  ON a.k = b.k [AND ...]
  [WHEN MATCHED THEN UPDATE SET *]
  [WHEN NOT MATCHED THEN INSERT *]
  [WHEN MATCHED AND <source bool column> THEN DELETE]`` →
  ``merge_into`` (file-granular copy-on-write, conflict-aborting,
  optionally idempotent under ``txn``).  The star forms are the only
  UPDATE/INSERT actions — matched keys take the whole source row,
  unmatched source keys insert — matching ``merge_into``'s CDC upsert
  semantics exactly; column-level SET lists in MERGE are rejected
  with a pointer at UPDATE.

Reference parity: the reference pipeline (single-process pandas) has
no SQL DML; this follows the PUBLIC Delta Lake / Iceberg statement
surface re-expressed on the manifest log.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import manifest as M


class SqlDmlError(ValueError):
    """The statement is outside the supported DML subset — the message
    says which production failed and what IS supported."""


_VERBS = (
    "UPDATE", "DELETE", "MERGE", "ALTER", "INSERT", "OPTIMIZE",
    "VACUUM", "DESCRIBE", "RESTORE", "COPY", "SHOW", "CONVERT",
)


def is_dml(statement: str) -> bool:
    head = statement.lstrip().split(None, 1)
    if not head or head[0].upper() not in _VERBS:
        return False
    stripped = statement.strip().rstrip(";").strip()
    if head[0].upper() == "DESCRIBE":
        # only DESCRIBE HISTORY/DETAIL are ours; DESCRIBE <view>/
        # TABLE/QUERY stay plain Spark SQL
        return bool(
            re.match(
                r"^DESCRIBE\s+(HISTORY|DETAIL)\b", stripped, re.IGNORECASE
            )
        )
    if head[0].upper() == "INSERT":
        # only the parsable bare-name form; INSERT INTO parquet.`...`
        # and other Spark-native shapes stay plain Spark SQL
        return bool(_INSERT_RE.match(stripped))
    if head[0].upper() == "SHOW":
        # only SHOW PARTITIONS targets a table; SHOW TABLES/VIEWS are
        # warehouse-catalog DDL
        return bool(
            re.match(r"^SHOW\s+PARTITIONS\b", stripped, re.IGNORECASE)
        )
    return True


# ---------------------------------------------------------------- lexing


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` (a single char) at top level only — never
    inside parentheses or single/double-quoted strings."""
    out, depth, q, start = [], 0, None, 0
    i = 0
    while i < len(s):
        c = s[i]
        if q:
            if c == q:
                # doubled quote = escaped quote inside the literal
                if i + 1 < len(s) and s[i + 1] == q:
                    i += 1
                else:
                    q = None
        elif c in ("'", '"'):
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return out


def _find_top_keyword(s: str, kw: str, start: int = 0) -> int:
    """Index of the first TOP-LEVEL, word-bounded, case-insensitive
    occurrence of ``kw`` (outside parens/quotes), or -1."""
    pat = re.compile(rf"\b{kw}\b", re.IGNORECASE)
    depth, q = 0, None
    i = start
    while i < len(s):
        c = s[i]
        if q:
            if c == q:
                if i + 1 < len(s) and s[i + 1] == q:
                    i += 1
                else:
                    q = None
        elif c in ("'", '"'):
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            mm = pat.match(s, i)
            if mm:
                return i
        i += 1
    return -1


def _split_top_keyword(s: str, kw: str) -> list[str]:
    """Split at every top-level occurrence of keyword ``kw``."""
    parts, pos = [], 0
    while True:
        i = _find_top_keyword(s, kw, pos)
        if i < 0:
            parts.append(s[pos:])
            return parts
        parts.append(s[pos:i])
        pos = i + len(kw)


# ------------------------------------------------------ SELECT time travel


#: shared with catalog._view_refs — ONE escape-rule implementation.
#: Backticks are masked too: a backtick-quoted identifier whose text
#: happens to look like `t@2` must never be rewritten as time travel.
from finance_etl_pipeline_spark.operators.sqltext import (  # noqa: E402
    mask_quotes as _mask_quotes,
)


#: `t VERSION AS OF 3` / `t TIMESTAMP AS OF '2026-01-01T00:00:00'` (or
#: epoch seconds) / the `t@3` shorthand — matched OUTSIDE quotes only
_TT_RE = re.compile(
    r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)\b"
    r"|\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'|\d+(?:\.\d+)?)"
    r"|\b(\w+)@(\d+)\b",
    re.IGNORECASE,
)


def expand_time_travel(
    spark: SparkSession, statement: str, tables: dict[str, str]
) -> str:
    """Rewrite Delta-style time travel in a SELECT into pinned temp
    views: ``FROM t VERSION AS OF 3``, ``FROM t TIMESTAMP AS OF
    '<ISO-8601 | epoch seconds>'``, and the ``t@3`` shorthand each
    become a reference to a registered snapshot view (named
    ``<t>__asof_v<n>``) reading through ``manifest.read_version`` —
    the rest of the statement stays Spark SQL verbatim, so time travel
    composes with joins/subqueries/CTEs for free.

    ``tables`` maps manifest-table view names to table dirs (the same
    map DML targets use).  Explicit VERSION/TIMESTAMP AS OF on a name
    NOT in the map is an error (silently handing Spark the unparsed
    clause would produce a confusing syntax failure); the ``@``
    shorthand only rewrites registered names, since ``name@digits``
    can legitimately appear in non-travel SQL only inside literals —
    which the quote mask already excludes.

    Timestamp resolution (``version_as_of``) raises
    ``VersionNotFoundError`` when the instant predates the earliest
    retained version; a pinned VERSION that never existed or was
    vacuumed raises it here at expansion (the snapshot's manifest is
    resolved eagerly), never as a downstream scan failure."""
    masked = _mask_quotes(statement)
    out = statement
    # right-to-left so earlier spans stay valid while we splice
    for m in sorted(
        _TT_RE.finditer(masked), key=lambda mm: -mm.start()
    ):
        if m.group(1) is not None:
            name, spec, kind = m.group(1), m.group(2), "version"
        elif m.group(3) is not None:
            name, spec, kind = m.group(3), m.group(4), "as_of"
        else:
            name, spec, kind = m.group(5), m.group(6), "version"
            if name not in tables:
                continue  # non-travel @: leave for Spark
        if name not in tables:
            raise SqlDmlError(
                f"time travel on {name!r}, which is not a registered "
                f"manifest table (have: {sorted(tables) or 'none'}); "
                "register it via --manifest-table NAME=DIR or a "
                "--warehouse catalog"
            )
        from finance_etl_pipeline_spark.operators import manifest as M

        if kind == "version":
            v = int(spec)
        else:
            raw = statement[m.start(4):m.end(4)]  # unmasked literal
            val = raw[1:-1] if raw.startswith("'") else float(raw)
            v = M.version_as_of(tables[name], val)
        view = f"{name}__asof_v{v}"
        M.read_version(
            spark, tables[name], version=v
        ).createOrReplaceTempView(view)
        out = out[: m.start()] + view + out[m.end():]
    return out


# ---------------------------------------------- metadata-only aggregates


#: one select-list item the manifest can answer without a scan
_META_AGG_RE = re.compile(
    r"^(COUNT|MIN|MAX)\s*\(\s*(\*|1|\w+)\s*\)(?:\s+AS\s+(\w+))?$",
    re.IGNORECASE | re.DOTALL,
)

#: a bare column reference (legal only with a GROUP BY that lists it)
_META_COL_RE = re.compile(
    r"^(\w+)(?:\s+AS\s+(\w+))?$", re.IGNORECASE
)

#: the whole-statement shape: aggregates over ONE bare table (no
#: JOIN/LIMIT/DISTINCT/ORDER — anything else fails the match and
#: takes the normal Spark path), with optional inline time travel, an
#: optional WHERE of partition-equality conjuncts, and an optional
#: GROUP BY over partition columns
_META_STMT_RE = re.compile(
    r"^SELECT\s+(.+?)\s+FROM\s+(\w+)"
    r"(?:@(\d+)|\s+VERSION\s+AS\s+OF\s+(\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'|\d+(?:\.\d+)?))?"
    r"(?:\s+WHERE\s+(.+?))?"
    r"(?:\s+GROUP\s+BY\s+(\w+(?:\s*,\s*\w+)*))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

#: one WHERE conjunct: `<col> = <'str' | number>` or `<col> IS NULL`
_META_PRED_RE = re.compile(
    r"^(\w+)\s*=\s*('(?:[^']|'')*'|[+-]?\d+(?:\.\d+)?)$", re.DOTALL
)
_META_NULL_RE = re.compile(r"^(\w+)\s+IS\s+NULL$", re.IGNORECASE)


def try_metadata_select(
    spark: SparkSession, statement: str, tables: dict[str, str]
):
    """The lakehouse metadata-query shortcut: a SELECT whose whole
    select-list is ``count(*)/count(1)/count(c)/min(c)/max(c)`` over
    ONE registered manifest table (optionally time-travel-pinned with
    ``@n`` / ``VERSION AS OF`` / ``TIMESTAMP AS OF``) is answered from
    the manifest's per-file stats — O(#files) driver metadata, zero
    data files opened.  On a 100 TB table this turns the most common
    interactive probe (`how many rows?`, `what's the date range?`)
    from a full scan into a shard read.

    A ``GROUP BY`` over hive-partition columns is served too — each
    file's partition identity is an exact manifest fact, so per-
    partition counts/mins/maxes need no scan either (the SHOW
    PARTITIONS shape, as real SQL).  Likewise a ``WHERE`` of
    partition-equality conjuncts (``p = 'x' AND q IS NULL``): every
    row of a file shares its partition values, so whole-file
    inclusion/exclusion is exact; any other predicate shape (ranges,
    OR, non-partition columns, literals whose type-kind mismatches
    the column) declines to the scan.

    Returns the DataFrame (one row ungrouped, one per live partition
    combo grouped) with EXACTLY the schema ``spark.sql`` would produce
    (Spark's default output names — the function lowercased over the
    argument as typed, ``count(1)`` for ``*``, bare group columns as
    typed — or the ``AS`` aliases), or **None when the statement does
    not match the shape or the manifest cannot PROVE the exact
    answer** (tombstones outstanding, missing per-file stats, a GROUP
    BY column that is not a partition column of every dir, see
    ``manifest.metadata_aggregate``) — the caller then runs the
    statement through the normal scan path, so this is an exactness-
    preserving fast path, never a semantics fork."""
    from pyspark.sql.types import StructField, StructType

    from finance_etl_pipeline_spark.operators import manifest as M

    m = _META_STMT_RE.match(statement.strip())
    if not m:
        return None
    name = m.group(2)
    if name not in tables:
        return None
    version = None
    try:
        if m.group(3) or m.group(4):
            version = int(m.group(3) or m.group(4))
        elif m.group(5):
            lit = m.group(5)
            val = lit[1:-1] if lit.startswith("'") else float(lit)
            version = M.version_as_of(tables[name], val)
    except (M.VersionNotFoundError, ValueError):
        return None  # the normal path raises the user-facing error
    # deliberately NARROWER than parse_where/_parse_literal (the DML
    # predicate grammar): this route's bar is bit-exact parity with
    # spark.sql, so it accepts only shapes whose semantics it can
    # prove (equality + IS NULL, backslash-free strings, strict
    # yyyy-mm-dd dates — see manifest._pred_literal) and declines the
    # rest; reusing the wider DML grammar would serve shapes whose
    # Spark coercion rules are not reimplemented here
    where = None
    if m.group(6):
        where = []
        for part in _split_top_keyword(m.group(6), "AND"):
            part = part.strip()
            nm = _META_NULL_RE.match(part)
            if nm:
                where.append((nm.group(1), "is_null", None))
                continue
            pm = _META_PRED_RE.match(part)
            if not pm:
                return None  # OR / ranges / expressions: normal path
            rawlit = pm.group(2)
            if rawlit.startswith("'"):
                lit: object = rawlit[1:-1].replace("''", "'")
            elif "." in rawlit:
                lit = float(rawlit)
            else:
                lit = int(rawlit)
            where.append((pm.group(1), "=", lit))
    group_by = (
        [g.strip() for g in m.group(7).split(",")] if m.group(7) else None
    )
    glower = {g.lower() for g in (group_by or [])}
    items: list[tuple] = []
    names: list[str] = []
    saw_agg = False
    for item in _split_top(m.group(1), ","):
        item = item.strip()
        im = _META_AGG_RE.match(item)
        if im:
            func, arg, alias = (
                im.group(1).upper(),
                im.group(2),
                im.group(3),
            )
            saw_agg = True
            if func == "COUNT" and arg in ("*", "1"):
                items.append(("count_star", None))
                names.append(alias or "count(1)")
            elif arg in ("*", "1"):
                return None  # min(*)/max(*) is not a thing
            else:
                items.append((func.lower(), arg))
                names.append(alias or f"{func.lower()}({arg})")
            continue
        cm = _META_COL_RE.match(item)
        if not cm or cm.group(1).lower() not in glower:
            return None  # bare column outside GROUP BY / other expr
        items.append(("group", cm.group(1)))
        names.append(cm.group(2) or cm.group(1))
    if not saw_agg:
        return None  # a pure column projection is not an aggregate
    try:
        res = M.metadata_aggregate(
            tables[name],
            items,
            version=version,
            group_by=group_by,
            where=where,
        )
    except (M.VersionNotFoundError, OSError):
        return None
    if res is None:
        return None
    rows, fields = res
    out_fields = [
        StructField(n, f.dataType, f.nullable)
        for n, f in zip(names, fields)
    ]
    return spark.createDataFrame(rows, StructType(out_fields))


# ------------------------------------------------------------- literals


_NUM = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _parse_literal(tok: str):
    tok = tok.strip()
    up = tok.upper()
    m = re.match(r"^DATE\s*'(.*)'$", tok, re.IGNORECASE)
    if m:
        return datetime.date.fromisoformat(m.group(1))
    m = re.match(r"^TIMESTAMP\s*'(.*)'$", tok, re.IGNORECASE)
    if m:
        return datetime.datetime.fromisoformat(m.group(1))
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in ("'", '"'):
        return tok[1:-1].replace(tok[0] * 2, tok[0])
    if _NUM.match(tok):
        return float(tok) if ("." in tok or "e" in up) else int(tok)
    raise SqlDmlError(
        f"unsupported literal {tok!r}: WHERE values must be numbers, "
        "'strings', DATE '...', or TIMESTAMP '...' (they are stored in "
        "the manifest tombstone and re-proven against file stats — "
        "arbitrary expressions cannot be)"
    )


_OPS = {
    "=": "==",
    "==": "==",
    "!=": "!=",
    "<>": "!=",
    "<=": "<=",
    ">=": ">=",
    "<": "<",
    ">": ">",
}


def parse_where(cond: str) -> list[tuple]:
    """A WHERE conjunction → the manifest predicate triples.  Only
    AND-joined simple terms — the shape ``delete_where`` can persist
    as a tombstone and every reader can re-prove against stats.  OR,
    grouping, and column-to-column comparisons are rejected loudly."""
    if _find_top_keyword(cond, "OR") >= 0:
        raise SqlDmlError(
            "OR is not supported in DML WHERE (the predicate becomes a "
            "stats-provable manifest tombstone); issue one statement "
            "per disjunct or use MERGE"
        )
    preds: list[tuple] = []
    for term in _split_top_keyword(cond, "AND"):
        term = term.strip()
        if not term:
            raise SqlDmlError(f"empty term in WHERE: {cond!r}")
        m = re.match(r"^(\w+)\s+IS\s+NOT\s+NULL$", term, re.IGNORECASE)
        if m:
            preds.append((m.group(1), "is_not_null"))
            continue
        m = re.match(r"^(\w+)\s+IS\s+NULL$", term, re.IGNORECASE)
        if m:
            preds.append((m.group(1), "is_null"))
            continue
        m = re.match(r"^(\w+)\s+IN\s*\((.+)\)$", term, re.IGNORECASE)
        if m:
            vals = [_parse_literal(v) for v in _split_top(m.group(2), ",")]
            preds.append((m.group(1), "in", vals))
            continue
        m = re.match(
            r"^(\w+)\s*(==|!=|<>|<=|>=|=|<|>)\s*(.+)$", term, re.DOTALL
        )
        if m:
            preds.append(
                (m.group(1), _OPS[m.group(2)], _parse_literal(m.group(3)))
            )
            continue
        raise SqlDmlError(
            f"unsupported WHERE term {term!r}: want `col op literal`, "
            "`col IS [NOT] NULL`, or `col IN (...)` joined by AND"
        )
    return preds


# ------------------------------------------------------------ execution


def _resolve(table_name: str, tables: dict[str, str]) -> str:
    if table_name not in tables:
        raise SqlDmlError(
            f"{table_name!r} is not a registered manifest table "
            f"(have: {sorted(tables) or 'none'}); DML targets must be "
            "versioned tables passed via --manifest-table NAME=DIR "
            "without @VERSION (DML always applies to the tip)"
        )
    return tables[table_name]


def _exec_delete(spark, stmt: str, tables: dict[str, str]) -> dict:
    m = re.match(
        r"^DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)$",
        stmt.strip().rstrip(";"),
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise SqlDmlError(
            "malformed DELETE: want `DELETE FROM <table> WHERE <cond>` "
            "(an unconditional DELETE would drop the table — overwrite "
            "it explicitly instead)"
        )
    tdir = _resolve(m.group(1), tables)
    version = M.delete_where(tdir, parse_where(m.group(2)))
    return {"op": "delete", "table": m.group(1), "version": version}


def _exec_update(spark, stmt: str, tables: dict[str, str]) -> dict:
    s = stmt.strip().rstrip(";")
    mh = re.match(r"^UPDATE\s+(\w+)\s+SET\s+", s, re.IGNORECASE)
    if not mh:
        raise SqlDmlError(
            "malformed UPDATE: want "
            "`UPDATE <table> SET col = expr[, ...] WHERE <cond>`"
        )
    rest = s[mh.end():]
    wi = _find_top_keyword(rest, "WHERE")
    if wi < 0:
        raise SqlDmlError(
            "UPDATE requires a WHERE clause (an unconditional UPDATE "
            "rewrites the whole table; do that as an explicit overwrite)"
        )
    set_part, cond = rest[:wi], rest[wi + len("WHERE"):]
    set_exprs = {}
    for assign in _split_top(set_part, ","):
        ci = assign.find("=")
        if ci < 0:
            raise SqlDmlError(f"malformed SET assignment: {assign.strip()!r}")
        col = assign[:ci].strip()
        if not re.match(r"^\w+$", col):
            raise SqlDmlError(f"malformed SET column name: {col!r}")
        # the right-hand side is ANY Spark SQL expression — it runs
        # through F.expr over the matching rows, Spark's language
        set_exprs[col] = F.expr(assign[ci + 1:].strip())
    tdir = _resolve(mh.group(1), tables)
    version = M.update_where(spark, tdir, parse_where(cond), set_exprs)
    return {"op": "update", "table": mh.group(1), "version": version}


_MERGE_HEAD = re.compile(
    r"^MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+USING\s+",
    re.IGNORECASE,
)


def _exec_merge(
    spark: SparkSession,
    stmt: str,
    tables: dict[str, str],
    txn=None,
    evolve_schema: bool = False,
) -> dict:
    s = stmt.strip().rstrip(";")
    mh = _MERGE_HEAD.match(s)
    if not mh:
        raise SqlDmlError(
            "malformed MERGE: want `MERGE INTO <table> [AS a] USING "
            "<view | (subquery)> [AS b] ON a.k = b.k [AND ...] "
            "[WHEN ... clauses]`"
        )
    target, t_alias = mh.group(1), mh.group(2) or mh.group(1)
    rest = s[mh.end():]
    oi = _find_top_keyword(rest, "ON")
    if oi < 0:
        raise SqlDmlError("MERGE requires an ON clause")
    src_part = rest[:oi].strip()
    on_and_when = rest[oi + len("ON"):]
    when_parts = _split_top_keyword(on_and_when, "WHEN")
    on_cond = when_parts[0].strip()
    clauses = ["WHEN " + w.strip() for w in when_parts[1:]]

    # ---- source: a registered view, or a parenthesized subquery
    if src_part.startswith("("):
        close = _matching_paren(src_part)
        sub, alias_part = src_part[1:close], src_part[close + 1:].strip()
        s_alias = re.sub(r"^AS\s+", "", alias_part, flags=re.IGNORECASE).strip()
        if not re.match(r"^\w+$", s_alias or ""):
            raise SqlDmlError(
                "a MERGE subquery source needs an alias: "
                "USING (SELECT ...) AS s"
            )
        source = spark.sql(expand_time_travel(spark, sub, tables))
    else:
        toks = src_part.split()
        if len(toks) == 1:
            s_alias = toks[0]
        elif len(toks) == 2 or (
            len(toks) == 3 and toks[1].upper() == "AS"
        ):
            s_alias = toks[-1]
        else:
            raise SqlDmlError(f"malformed MERGE source: {src_part!r}")
        source = spark.table(toks[0])

    # ---- ON: conjunction of same-named key equalities
    keys = []
    for term in _split_top_keyword(on_cond, "AND"):
        m = re.match(
            r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", term
        )
        if not m:
            raise SqlDmlError(
                f"unsupported ON term {term.strip()!r}: want "
                "`<target_alias>.<col> = <source_alias>.<col>` equalities "
                "joined by AND"
            )
        qa, ca, qb, cb = m.groups()
        sides = {qa: ca, qb: cb}
        if set(sides) != {t_alias, s_alias}:
            raise SqlDmlError(
                f"ON term {term.strip()!r} must reference both "
                f"{t_alias!r} (target) and {s_alias!r} (source)"
            )
        if ca != cb:
            raise SqlDmlError(
                f"ON term {term.strip()!r}: merge keys must have the "
                "same column name on both sides (rename in the source "
                "subquery if needed)"
            )
        keys.append(ca)

    # ---- WHEN clauses: the star upsert forms + an optional
    # source-flag DELETE, exactly merge_into's semantics
    delete_col = None
    saw_update = saw_insert = False
    for c in clauses:
        if re.match(
            r"^WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*$", c, re.IGNORECASE
        ):
            saw_update = True
        elif re.match(
            r"^WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*$", c, re.IGNORECASE
        ):
            saw_insert = True
        else:
            m = re.match(
                r"^WHEN\s+MATCHED\s+AND\s+(?:(\w+)\.)?(\w+)\s+THEN\s+DELETE$",
                c,
                re.IGNORECASE,
            )
            if m:
                if m.group(1) and m.group(1) != s_alias:
                    raise SqlDmlError(
                        "the DELETE flag must be a SOURCE column "
                        f"(got {m.group(1)}.{m.group(2)})"
                    )
                delete_col = m.group(2)
            else:
                raise SqlDmlError(
                    f"unsupported MERGE clause {c!r}: supported are "
                    "`WHEN MATCHED THEN UPDATE SET *`, "
                    "`WHEN NOT MATCHED THEN INSERT *`, and "
                    "`WHEN MATCHED AND <source bool col> THEN DELETE` "
                    "(column-level SET lists belong in UPDATE)"
                )
    if clauses and not (saw_update and saw_insert):
        raise SqlDmlError(
            "MERGE runs as a CDC upsert: include BOTH `WHEN MATCHED "
            "THEN UPDATE SET *` and `WHEN NOT MATCHED THEN INSERT *` "
            "(or neither — the upsert is the default)"
        )

    tdir = _resolve(target, tables)
    version = M.merge_into(
        spark,
        tdir,
        source,
        keys,
        delete_col=delete_col,
        txn=txn,
        evolve_schema=evolve_schema,
    )
    return {"op": "merge", "table": target, "version": version}


def _matching_paren(s: str) -> int:
    """Index of the ')' closing the '(' at s[0]."""
    depth, q = 0, None
    for i, c in enumerate(s):
        if q:
            if c == q and not (i + 1 < len(s) and s[i + 1] == q):
                q = None
        elif c in ("'", '"'):
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    raise SqlDmlError(f"unbalanced parentheses in {s[:60]!r}...")


def _exec_alter(spark, stmt: str, tables: dict[str, str]) -> dict:
    s = stmt.strip().rstrip(";")
    m = re.match(
        r"^ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
        r"CHECK\s*\((.+)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        tdir = _resolve(m.group(1), tables)
        version = M.add_constraint(spark, tdir, m.group(2), m.group(3).strip())
        return {
            "op": "add_constraint",
            "table": m.group(1),
            "version": version,
        }
    m = re.match(
        r"^ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        tdir = _resolve(m.group(1), tables)
        version = M.drop_constraint(tdir, m.group(2))
        return {
            "op": "drop_constraint",
            "table": m.group(1),
            "version": version,
        }
    m = re.match(
        r"^ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        tdir = _resolve(m.group(1), tables)
        version = M.rename_column(tdir, m.group(2), m.group(3))
        return {
            "op": "rename_column",
            "table": m.group(1),
            "version": version,
        }
    m = re.match(
        r"^ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        tdir = _resolve(m.group(1), tables)
        version = M.drop_column(tdir, m.group(2))
        return {
            "op": "drop_column",
            "table": m.group(1),
            "version": version,
        }
    m = re.match(
        r"^ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        tdir = _resolve(m.group(1), tables)
        version = M.add_column(tdir, m.group(2), m.group(3))
        return {
            "op": "add_column",
            "table": m.group(1),
            "version": version,
        }
    raise SqlDmlError(
        "malformed ALTER: want `ALTER TABLE <t> ADD CONSTRAINT <name> "
        "CHECK (<expr>)`, `... DROP CONSTRAINT <name>`, "
        "`... RENAME COLUMN <a> TO <b>`, `... DROP COLUMN <c>`, or "
        "`... ADD COLUMN <c> <type>` "
        "(the only ALTER forms the manifest log executes)"
    )


def execute_dml(
    spark: SparkSession,
    statement: str,
    tables: dict[str, str],
    txn: tuple[str, int] | None = None,
    evolve_schema: bool = False,
) -> dict:
    """Execute one DML statement against the manifest tables in
    ``tables`` ({view name: table dir}).  Returns {op, table,
    version}.  Raises ``SqlDmlError`` for statements outside the
    subset, and propagates ``ConcurrentTableModificationError`` from
    the underlying operators (conflict-abort: re-run against the new
    snapshot).  ``txn=(app_id, version)`` applies to MERGE and
    INSERT (the idempotent-replay stamp); ``evolve_schema`` to MERGE
    only (the autoMerge flag of ``merge_into``)."""
    verb = statement.lstrip().split(None, 1)
    verb = verb[0].upper() if verb else ""
    if verb == "DELETE":
        return _exec_delete(spark, statement, tables)
    if verb == "UPDATE":
        return _exec_update(spark, statement, tables)
    if verb == "MERGE":
        return _exec_merge(
            spark, statement, tables, txn=txn, evolve_schema=evolve_schema
        )
    if verb == "ALTER":
        return _exec_alter(spark, statement, tables)
    if verb == "INSERT":
        return _exec_insert(spark, statement, tables, txn=txn)
    if verb == "OPTIMIZE":
        return _exec_optimize(spark, statement, tables)
    if verb == "VACUUM":
        return _exec_vacuum(spark, statement, tables)
    if verb == "DESCRIBE":
        return _exec_describe(spark, statement, tables)
    if verb == "RESTORE":
        return _exec_restore(spark, statement, tables)
    if verb == "COPY":
        return _exec_copy(spark, statement, tables)
    if verb == "SHOW":
        return _exec_show_partitions(spark, statement, tables)
    if verb == "CONVERT":
        return _exec_convert(spark, statement, tables)
    raise SqlDmlError(f"not a DML statement: {statement[:60]!r}")


_CONVERT_RE = re.compile(
    r"^CONVERT\s+TO\s+MANIFEST\s+'([^']+)'\s+AS\s+(\w+)$",
    re.IGNORECASE,
)


def _exec_convert(spark, stmt: str, tables: dict[str, str]) -> dict:
    """``CONVERT TO MANIFEST '<parquet dir>' AS t`` — adopt an
    existing parquet directory in place as v1 of the (empty)
    registered table ``t`` (``manifest.convert_parquet``; the Delta
    ``CONVERT TO DELTA`` shape)."""
    m = _CONVERT_RE.match(stmt.strip().rstrip(";").strip())
    if not m:
        raise SqlDmlError(
            "malformed CONVERT: want `CONVERT TO MANIFEST "
            "'<parquet dir>' AS <t>` (t must be a registered, "
            "version-less table name)"
        )
    tdir = _resolve(m.group(2), tables)
    version = M.convert_parquet(spark, m.group(1), tdir)
    return {
        "op": "convert",
        "table": m.group(2),
        "version": version,
    }


_SHOW_PARTS_RE = re.compile(
    r"^SHOW\s+PARTITIONS\s+(\w+)"
    r"(?:@(\d+)|\s+VERSION\s+AS\s+OF\s+(\d+))?$",
    re.IGNORECASE,
)


def _exec_show_partitions(
    spark, stmt: str, tables: dict[str, str]
) -> dict:
    """``SHOW PARTITIONS t [VERSION AS OF n | @n]`` — the partition
    inventory from METADATA only (``manifest.table_partitions``: exact
    per-file partition identities; no directory listing, no file
    opened)."""
    m = _SHOW_PARTS_RE.match(stmt.strip().rstrip(";").strip())
    if not m:
        raise SqlDmlError(
            "malformed SHOW: want `SHOW PARTITIONS <t> "
            "[VERSION AS OF n | @n]` (SHOW TABLES/VIEWS are "
            "warehouse DDL)"
        )
    tdir = _resolve(m.group(1), tables)
    version = (
        int(m.group(2) or m.group(3))
        if (m.group(2) or m.group(3))
        else None
    )
    return {
        "op": "show_partitions",
        "table": m.group(1),
        "version": version
        if version is not None
        else M.latest_version(tdir),
        "partitions": M.table_partitions(tdir, version=version),
    }


_COPY_RE = re.compile(
    r"^COPY\s+INTO\s+(\w+)\s+FROM\s+'([^']+)'"
    r"(?:\s+PATTERN\s*=?\s*'([^']+)')?$",
    re.IGNORECASE,
)


def _exec_copy(spark, stmt: str, tables: dict[str, str]) -> dict:
    """``COPY INTO t FROM '<dir or glob>' [PATTERN = '<glob>']`` —
    idempotent file ingestion via ``manifest.copy_into`` (load-history
    dedup by source path; re-running the statement is a no-op)."""
    m = _COPY_RE.match(stmt.strip().rstrip(";").strip())
    if not m:
        raise SqlDmlError(
            "malformed COPY: want `COPY INTO <t> FROM '<dir|glob>' "
            "[PATTERN = '<glob>']`"
        )
    tdir = _resolve(m.group(1), tables)
    res = M.copy_into(
        spark, tdir, m.group(2), pattern=m.group(3) or "*.parquet"
    )
    return {
        "op": "copy_into",
        "table": m.group(1),
        "version": res["version"],
        "ingested": res["ingested"],
        "skipped": res["skipped"],
    }


_RESTORE_RE = re.compile(
    r"^RESTORE\s+TABLE\s+(\w+)\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+('[^']*'|\d+(?:\.\d+)?))$",
    re.IGNORECASE,
)


def _exec_restore(spark, stmt: str, tables: dict[str, str]) -> dict:
    """``RESTORE TABLE t TO VERSION AS OF n`` / ``TO TIMESTAMP AS OF
    '<ISO-8601 | epoch>'`` → ``manifest.restore_table`` (rollback as a
    new history-preserving version)."""
    m = _RESTORE_RE.match(stmt.strip().rstrip(";"))
    if not m:
        raise SqlDmlError(
            "malformed RESTORE: want `RESTORE TABLE <table> TO "
            "VERSION AS OF <n>` or `... TO TIMESTAMP AS OF "
            "'<ISO-8601 | epoch seconds>'`"
        )
    name, ver, ts = m.group(1), m.group(2), m.group(3)
    tdir = _resolve(name, tables)
    if ver is not None:
        version = M.restore_table(tdir, version=int(ver))
    else:
        val = ts[1:-1] if ts.startswith("'") else float(ts)
        version = M.restore_table(tdir, as_of=val)
    return {"op": "restore", "table": name, "version": version}


# ------------------------------------------------------------ catalog DDL

_DDL_VERBS = ("CREATE", "DROP", "SHOW")


_RENAME_TBL_RE = re.compile(
    r"^ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)


def is_ddl(statement: str) -> bool:
    head = statement.lstrip().split(None, 1)
    if bool(head) and head[0].upper() in _DDL_VERBS:
        # SHOW PARTITIONS targets a TABLE (DML side, like DESCRIBE
        # HISTORY); only SHOW TABLES/VIEWS manage the catalog
        if re.match(
            r"^SHOW\s+PARTITIONS\b", statement.strip(), re.IGNORECASE
        ):
            return False
        return True
    # table rename is catalog DDL; every other ALTER stays DML
    return bool(_RENAME_TBL_RE.match(statement.strip()))


_CREATE_RE = re.compile(
    r"^CREATE\s+TABLE\s+(\w+)"
    r"(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?"
    r"(?:\s+LOCATION\s+'([^']+)')?"
    r"(?:\s+AS\s+(.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^DROP\s+TABLE\s+(\w+)(\s+PURGE)?$", re.IGNORECASE
)
_CREATE_VIEW_RE = re.compile(
    r"^CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_VIEW_RE = re.compile(r"^DROP\s+VIEW\s+(\w+)$", re.IGNORECASE)


def execute_ddl(
    spark: SparkSession, statement: str, warehouse_root: str
) -> dict:
    """Catalog DDL against a warehouse root (operators/catalog.py):

    * ``CREATE TABLE name`` — register a managed table (no data yet;
      the CREATE-then-INSERT shape);
    * ``CREATE TABLE name [PARTITIONED BY (c, ...)] AS <select>`` —
      CTAS: the SELECT runs through Spark SQL verbatim (temp views
      registered by the caller are visible) and lands as the table's
      v1;
    * ``CREATE TABLE name LOCATION '<dir>'`` — register an EXTERNAL
      manifest table in place (no data written);
    * ``DROP TABLE name [PURGE]`` — unregister; a managed table
      holding data refuses without PURGE, external data is never
      deleted;
    * ``ALTER TABLE old RENAME TO new`` — catalog rename (metadata
      only; the directory is untouched);
    * ``SHOW TABLES`` — {op, rows: [{name, dir, managed}]}.

    Returns {op, table?, dir?, version?, rows?}.  Raises SqlDmlError
    outside the subset; catalog conflicts (duplicate name) raise
    ``catalog.TableExistsError``."""
    from finance_etl_pipeline_spark.operators import catalog as C

    stmt = statement.strip().rstrip(";").strip()
    head = stmt.split(None, 1)[0].upper() if stmt else ""
    m = _RENAME_TBL_RE.match(stmt)
    if m:
        C.rename_table(warehouse_root, m.group(1), m.group(2))
        return {
            "op": "rename_table",
            "table": m.group(2),
            "dir": C.resolve(warehouse_root, m.group(2)),
        }
    if head == "SHOW":
        words = stmt.upper().split()
        if words == ["SHOW", "TABLES"]:
            return {
                "op": "show_tables",
                "rows": C.show_tables(warehouse_root),
            }
        if words == ["SHOW", "VIEWS"]:
            return {"op": "show_views", "rows": C.show_views(warehouse_root)}
        raise SqlDmlError(
            f"unsupported SHOW statement: {stmt[:60]!r} "
            "(supported: SHOW TABLES, SHOW VIEWS)"
        )
    if head == "DROP":
        m = _DROP_VIEW_RE.match(stmt)
        if m:
            C.drop_view(warehouse_root, m.group(1))
            return {"op": "drop_view", "table": m.group(1)}
        m = _DROP_RE.match(stmt)
        if not m:
            raise SqlDmlError(
                f"unsupported DROP statement: {stmt[:60]!r} "
                "(supported: DROP TABLE name [PURGE], DROP VIEW name)"
            )
        name, purge = m.group(1), bool(m.group(2))
        C.drop_table(warehouse_root, name, purge=purge)
        return {"op": "drop_table", "table": name}
    if head == "CREATE":
        m = _CREATE_VIEW_RE.match(stmt)
        if m:
            replace, name, select = (
                bool(m.group(1)),
                m.group(2),
                m.group(3).strip(),
            )
            # semantic validation while a session is at hand: the
            # SELECT must analyze against the registered views/tables
            # (catches typo'd columns at CREATE, not at first read).
            # The catalog layer re-checks names/cycles atomically.
            spark.sql(select)
            C.create_view(warehouse_root, name, select, or_replace=replace)
            return {"op": "create_view", "table": name}
        m = _CREATE_RE.match(stmt)
        if not m:
            raise SqlDmlError(
                f"unsupported CREATE statement: {stmt[:60]!r} "
                "(supported: CREATE TABLE name [PARTITIONED BY (...)]"
                " [LOCATION '<dir>'] [AS <select>], "
                "CREATE [OR REPLACE] VIEW name AS <select>)"
            )
        name, parts, location, select = m.groups()
        partition_by = (
            [c.strip() for c in parts.split(",") if c.strip()]
            if parts
            else None
        )
        if location and select:
            raise SqlDmlError(
                "CREATE TABLE ... LOCATION ... AS is not supported: "
                "an external location is registered in place, CTAS "
                "writes managed data — pick one"
            )
        if select:
            names = {
                r["name"]: r["dir"] for r in C.show_tables(warehouse_root)
            }
            df = spark.sql(expand_time_travel(spark, select, names))
            tdir, v = C.create_table_as(
                spark, warehouse_root, name, df, partition_by=partition_by
            )
            return {
                "op": "create_table_as",
                "table": name,
                "dir": tdir,
                "version": v,
            }
        if partition_by:
            raise SqlDmlError(
                "PARTITIONED BY without AS has nothing to partition: "
                "partitioning is recorded per commit"
            )
        tdir = C.create_table(warehouse_root, name, location=location)
        return {"op": "create_table", "table": name, "dir": tdir}
    raise SqlDmlError(f"not a DDL statement: {statement[:60]!r}")


def register_catalog_views(spark: SparkSession, warehouse_root: str) -> dict:
    """Expand every catalog VIEW into a Spark temp view — call AFTER
    the warehouse's tables are registered.  Views may reference other
    views, so registration iterates to a fixpoint (a view registers
    once everything it references resolves); creation-time cycle
    rejection guarantees termination.  Returns {view name: None on
    success, else the analysis error string} so callers can warn about
    broken views (e.g. a referenced table was dropped) without wedging
    the whole session."""
    from finance_etl_pipeline_spark.operators import catalog as C

    pending = {v["name"]: v["sql"] for v in C.show_views(warehouse_root)}
    status: dict = {}
    progress = True
    while pending and progress:
        progress = False
        for name in sorted(pending):
            try:
                spark.sql(pending[name]).createOrReplaceTempView(name)
            except Exception as e:  # noqa: BLE001 — analysis errors vary
                status[name] = str(e)
                continue
            status[name] = None
            del pending[name]
            progress = True
    return status


# ------------------------------------------- utility / insert verbs

_INSERT_RE = re.compile(
    r"^INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_RE = re.compile(
    r"^OPTIMIZE\s+(\w+)(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*"
    r"\(([^)]*)\))?$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM_RE = re.compile(
    r"^VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?"
    r"(?:\s+KEEP\s+LAST\s+(\d+))?(\s+DRY\s+RUN)?$",
    re.IGNORECASE,
)


def _table_partition_layout(tdir: str) -> list[str] | None:
    """The table's established hive layout, when EVERY data dir of the
    tip shares one — INSERT inherits it (Delta semantics); mixed or
    unpartitioned tables insert unpartitioned."""
    m = M._read_manifest(tdir, M.latest_version(tdir))
    part_dirs = m.get("partitioned_dirs", {})
    if not part_dirs or set(part_dirs) != set(m["dirs"]):
        return None
    layouts = {tuple(v) for v in part_dirs.values()}
    return list(layouts.pop()) if len(layouts) == 1 else None


def _exec_insert(
    spark, stmt: str, tables: dict[str, str], txn=None
) -> dict:
    """``INSERT INTO t <select|VALUES...>`` appends one version;
    ``INSERT OVERWRITE t <select>`` replaces the table.  The payload
    after the table name is handed to Spark SQL verbatim (temp views
    visible), so ``SELECT ...`` and ``VALUES (...), (...)`` both
    work.  Column matching is BY NAME against the table's schema
    (reordered when needed); on a uniformly hive-partitioned table
    the insert inherits the partition layout."""
    m = _INSERT_RE.match(stmt.strip().rstrip(";"))
    if not m:
        raise SqlDmlError(
            "malformed INSERT: want `INSERT INTO|OVERWRITE <table> "
            "<select or VALUES ...>`"
        )
    kind, name, payload = m.groups()
    tdir = _resolve(name, tables)
    # time travel composes: INSERT INTO t SELECT * FROM t VERSION AS
    # OF 3 is the restore-into-copy shape
    df = spark.sql(expand_time_travel(spark, payload, tables))
    mode = "append" if kind.upper() == "INTO" else "overwrite"
    # VALUES is detected SYNTACTICALLY (the payload starts with the
    # keyword), never inferred from colN-shaped output names: a
    # genuine SELECT whose source columns are literally col1..colN
    # must match BY NAME (and error when the names differ), not be
    # silently positionally renamed to the table schema
    is_values = bool(
        re.match(r"^VALUES\b", payload.lstrip(), re.IGNORECASE)
    )
    part = None
    if M.latest_version(tdir) > 0:
        from pyspark.sql.types import StructType

        mfest = M._read_manifest(tdir, M.latest_version(tdir))
        tbl_schema = (
            StructType.fromJson(mfest["schema"])
            if "schema" in mfest
            else None
        )
        if tbl_schema is not None:
            have = set(df.columns)
            want = [f.name for f in tbl_schema.fields]
            if is_values:
                if len(df.columns) != len(want):
                    raise SqlDmlError(
                        f"INSERT {kind.upper()} {name}: VALUES arity "
                        f"{len(df.columns)} does not match the table's "
                        f"{len(want)} column(s) {want}"
                    )
                df = df.toDF(*want)  # bare VALUES: positional
            elif set(want) == have and df.columns != want:
                df = df.select(*want)  # named source: by name
            elif not have.issubset(set(want)) and mode == "append":
                extra = sorted(have - set(want))
                raise SqlDmlError(
                    f"INSERT INTO {name}: source has column(s) "
                    f"{extra} the table lacks; evolve the schema via "
                    "MERGE --evolve-schema or overwrite explicitly"
                )
        if mode == "append":
            part = _table_partition_layout(tdir)
    version = M.commit(df, tdir, mode=mode, partition_by=part, txn=txn)
    return {"op": f"insert_{mode}", "table": name, "version": version}


def _exec_optimize(spark, stmt: str, tables: dict[str, str]) -> dict:
    """``OPTIMIZE t [WHERE <conjunction>] [ZORDER BY (c, ...)]`` →
    ``compact_table`` / scoped ``compact_where``."""
    m = _OPTIMIZE_RE.match(stmt.strip().rstrip(";"))
    if not m:
        raise SqlDmlError(
            "malformed OPTIMIZE: want `OPTIMIZE <table> "
            "[WHERE <cond>] [ZORDER BY (col, ...)]`"
        )
    name, cond, zorder = m.groups()
    tdir = _resolve(name, tables)
    zcols = (
        [c.strip() for c in zorder.split(",") if c.strip()]
        if zorder
        else None
    )
    if cond:
        version = M.compact_where(
            spark, tdir, parse_where(cond), zorder_cols=zcols
        )
    else:
        version = M.compact_table(spark, tdir, zorder_cols=zcols)
    return {"op": "optimize", "table": name, "version": version}


def _exec_vacuum(spark, stmt: str, tables: dict[str, str]) -> dict:
    """``VACUUM t [RETAIN n HOURS] [KEEP LAST k] [DRY RUN]`` →
    ``vacuum`` (defaults: 1 hour retention, keep the tip only — the
    operator's own defaults).  DRY RUN reports the reclaimable data
    paths without deleting anything."""
    m = _VACUUM_RE.match(stmt.strip().rstrip(";"))
    if not m:
        raise SqlDmlError(
            "malformed VACUUM: want `VACUUM <table> "
            "[RETAIN <n> HOURS] [KEEP LAST <k>] [DRY RUN]`"
        )
    name, hours, keep, dry = m.groups()
    tdir = _resolve(name, tables)
    removed = M.vacuum(
        tdir,
        keep_last=int(keep) if keep else 1,
        retention_seconds=float(hours) * 3600.0 if hours else 3600.0,
        dry_run=bool(dry),
    )
    out = {
        "op": "vacuum_dry_run" if dry else "vacuum",
        "table": name,
        "version": M.latest_version(tdir),
        "removed": len(removed),
    }
    if dry:
        out["paths"] = removed
    return out


def _exec_describe(spark, stmt: str, tables: dict[str, str]) -> dict:
    """``DESCRIBE HISTORY t`` → ``history()`` rows (checkpoint-served
    on long histories); ``DESCRIBE DETAIL t`` → the one-dict snapshot
    summary (``describe_detail``)."""
    s = stmt.strip().rstrip(";")
    m = re.match(r"^DESCRIBE\s+HISTORY\s+(\w+)$", s, re.IGNORECASE)
    if m:
        tdir = _resolve(m.group(1), tables)
        return {
            "op": "describe_history",
            "table": m.group(1),
            "rows": M.history(tdir),
        }
    m = re.match(r"^DESCRIBE\s+DETAIL\s+(\w+)$", s, re.IGNORECASE)
    if m:
        tdir = _resolve(m.group(1), tables)
        return {
            "op": "describe_detail",
            "table": m.group(1),
            "detail": M.describe_detail(tdir),
        }
    raise SqlDmlError(
        "malformed DESCRIBE: want `DESCRIBE HISTORY <table>` or "
        "`DESCRIBE DETAIL <table>`"
    )
