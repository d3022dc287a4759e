"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column names, and order-insensitive values (with a
small float tolerance — the driver uses a value hash, so we are
stricter locally than the driver only in reporting, not in semantics).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        # deliberately NO tolerance: every query's rounding goes through
        # the shared fround formula, and all 79 oracles measured
        # bit-exact at sf0.01 — keep the local gate as strict as any
        # driver-side value hash
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark, qdef, sf_dir: str) -> dict:
    """Returns {'name', 'ok', 'detail'} for one QueryDef."""
    sdf = qdef.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    if qdef.oracle is None:
        return {
            "name": qdef.name,
            "ok": True,
            "detail": f"rows-only check: {len(s_rows)} rows",
        }
    con = duck_connection(sf_dir)
    res = con.execute(qdef.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return {
            "name": qdef.name,
            "ok": False,
            "detail": f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}",
        }
    if len(s_rows) != len(d_rows):
        return {
            "name": qdef.name,
            "ok": False,
            "detail": f"row count differs: spark={len(s_rows)} duck={len(d_rows)}",
        }
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return {
                "name": qdef.name,
                "ok": False,
                "detail": f"row {i} differs (sorted order):\n  spark={a}\n  duck ={b}",
            }
    return {"name": qdef.name, "ok": True, "detail": f"{len(s_rows)} rows match"}
