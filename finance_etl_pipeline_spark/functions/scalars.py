"""Scalar-function helpers shared by plans and the finance pipeline.

``fround`` — cross-engine deterministic rounding
------------------------------------------------
Spark's ``round()`` converts the double's shortest decimal repr to
BigDecimal and applies HALF_UP; DuckDB multiplies and rounds the
binary double.  On near-tie values (common in money data: 2dp × 2dp
products have exact 4-decimal expansions) the two disagree by one ulp
of the rounded digit — measured at ~0.5% of rows on the testdata.

The driver's correctness gate hashes values, so rounding must be
*bit-identical* across engines.  ``fround`` therefore avoids both
engines' ``round`` and uses only IEEE-deterministic primitives that
exist in both: ``floor(x * 10^n + 0.5001) / 10^n``.

- per-row expressions: inputs are identical parquet doubles and every
  step is an IEEE op → bit-identical outputs in Spark and DuckDB;
- aggregates: partial-sum order differs across engines (ulp-level
  noise); the 1e-4 epsilon pushes exact half-ties reliably to the
  same side in both engines while sitting far from the data's own
  decimal grid.

Semantics: HALF_UP toward +inf, with a +1e-4-of-a-unit bias at the
boundary — a presentation-rounding contract, documented here once.
Use ``sql_round()`` to emit the matching oracle-SQL text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column | str, n: int = 2) -> Column:
    """Cross-engine deterministic round-half-up to n decimals."""
    c = F.col(col) if isinstance(col, str) else col
    p = 10**n
    return F.floor(c * p + 0.5001) / p


def sql_round(expr: str, n: int = 2) -> str:
    """The oracle-SQL text matching ``fround`` bit-for-bit."""
    p = 10**n
    return f"floor(({expr}) * {p} + 0.5001) / {p}"


def igrid(col: Column | str, n: int = 2) -> Column:
    """``fround``'s grid value scaled to an exact BIGINT.

    ``fround(x, n)`` is by construction an integer divided by 10^n;
    the division back to double reintroduces a float column that a
    downstream hasher may canonicalize differently per engine/run.
    ``igrid`` stops before the division: the output is the integer
    numerator itself (``floor(x*10^n + 0.5001)`` as BIGINT) — e.g.
    n=6 → micro-units (ppm), n=2 → cents.  An integer column cannot
    hash-diverge when values match, so queries whose contract is a
    rounded metric emit this instead of the double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**n) + 0.5001).cast("long")


def sql_igrid(expr: str, n: int = 2) -> str:
    """The oracle-SQL text matching ``igrid`` bit-for-bit (DuckDB's
    ``floor`` returns DOUBLE, hence the explicit BIGINT cast)."""
    return f"CAST(floor(({expr}) * {10 ** n} + 0.5001) AS BIGINT)"


def sql_hash60(expr: str) -> str:
    """DuckDB twin of ``operators.dedup.hash60_expr`` — first 15 hex
    chars of md5 as a 60-bit BIGINT.  The Spark/SQL pairing is the
    determinism contract's most fragile invariant, so every plan
    module builds its oracle hash text from THIS one helper; change
    the Spark expression and this string together or nothing matches.
    """
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
