"""Incremental view maintenance for JOIN views (append-only deltas).

``operators/rollup.py`` maintains AGGREGATE views from partial state;
this module adds the other classic warehouse view shape: a
materialized equi-join J = A ⋈ B kept current as batches land,
without ever re-joining the full tables.  The standard delta rule for
inserts:

    ΔJ = (ΔA ⋈ B_old)  ∪  (A_old ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

so each refresh joins only delta-sized inputs against the pre-batch
snapshots.  The reference repo recomputes everything each run
(single-process pandas, reference transform.py); this is the
incremental counterpart a warehouse actually deploys.

Scope: inserts-only (the append-only fact/CDC-insert case).  Deletes
and updates need multiplicity counting (maintain a per-row count and
subtract on retraction — the counting algorithm of Gupta/Mumick); the
MERGE path in ``operators/merge.py`` plus a view recompute of touched
keys is this repo's audited alternative for mutable dimensions.

Scale posture: every term shuffles |Δ| rows against one snapshot; with
both base tables BUCKETED on the join key (tests/test_bucketing.py),
the snapshot side never re-shuffles — the refresh cost is
O(|Δ| + matched output), independent of |A|+|B|.  The ΔA ⋈ ΔB term is
delta × delta (tiny).  Refreshes compose: applying batches one at a
time or replaying them in bulk yields the identical view (associative
deltas), which is what the test pins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame | None,
    delta_a: DataFrame | None,
    b_old: DataFrame | None,
    delta_b: DataFrame | None,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame | None:
    """The view delta for one refresh: rows J gains when ``delta_a``
    appends to A and ``delta_b`` appends to B.  Either delta may be
    None (one-sided refresh); a snapshot may be None only when the
    opposite delta is None (it is then never joined).  ``how`` must be
    'inner' — outer joins need retraction handling that inserts-only
    deltas cannot express."""
    if how != "inner":
        raise ValueError("join_view_delta maintains INNER joins only")
    terms: list[DataFrame] = []
    if delta_a is not None:
        terms.append(delta_a.join(b_old, on, "inner"))
    if delta_b is not None:
        terms.append(a_old.join(delta_b, on, "inner"))
    if delta_a is not None and delta_b is not None:
        terms.append(delta_a.join(delta_b, on, "inner"))
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def counted_join_view_delta(
    a_pre: DataFrame | None,
    delta_a: DataFrame | None,
    b_pre: DataFrame | None,
    delta_b: DataFrame | None,
    on: Sequence[str] | str,
    sign_col: str = "sign",
) -> DataFrame | None:
    """Delete-capable view delta (the counting algorithm of
    Gupta/Mumick): deltas carry a ``sign`` column (+1 insert, −1
    delete), snapshots are unsigned row sets, and the emitted delta
    carries the product of the contributing signs.  Apply it with
    ``merge_counts`` — a view row's multiplicity is the running sum of
    its signs, and it leaves the view when that sum reaches zero.

    Same three-term rule as ``join_view_delta``; the δA ⋈ δB term
    multiplies signs (a deleted-A row joined to a deleted-B row
    RE-ADDS the pair that the two one-sided terms each removed once —
    the classic double-retraction correction)."""
    s_a = F.col(f"__da.{sign_col}")
    s_b = F.col(f"__db.{sign_col}")
    terms: list[DataFrame] = []
    if delta_a is not None:
        terms.append(
            delta_a.alias("__da")
            .join(b_pre, on, "inner")
            .withColumn("__sign", s_a)
            .drop(sign_col)
        )
    if delta_b is not None:
        terms.append(
            a_pre.join(delta_b.alias("__db"), on, "inner")
            .withColumn("__sign", s_b)
            .drop(sign_col)
        )
    if delta_a is not None and delta_b is not None:
        terms.append(
            delta_a.alias("__da")
            .withColumnRenamed(sign_col, "__sa")
            .join(
                delta_b.alias("__db").withColumnRenamed(sign_col, "__sb"),
                on,
                "inner",
            )
            .withColumn("__sign", F.col("__sa") * F.col("__sb"))
            .drop("__sa", "__sb")
        )
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out.withColumnRenamed("__sign", sign_col)


def merge_counts(
    view_counts: DataFrame | None,
    delta: DataFrame,
    sign_col: str = "sign",
    count_col: str = "multiplicity",
) -> DataFrame:
    """Fold a signed delta into the counted view: group the delta by
    payload, add its sign sum to the stored multiplicity, drop rows
    that reach zero.  The stored view is (payload → multiplicity > 0);
    the user-facing rowset re-expands multiplicities (here every base
    row is unique, so multiplicity stays 1 and the expansion is the
    identity — the column exists for the algebra, not for display)."""
    keys = [c for c in delta.columns if c != sign_col]
    d = delta.groupBy(*keys).agg(
        F.sum(sign_col).cast("long").alias("__delta_n")
    )
    if view_counts is None:
        merged = d.select(*keys, F.col("__delta_n").alias(count_col))
    else:
        v = view_counts.withColumnRenamed(count_col, "__old_n")
        merged = v.join(d, keys, "full_outer").select(
            *keys,
            (
                F.coalesce(F.col("__old_n"), F.lit(0))
                + F.coalesce(F.col("__delta_n"), F.lit(0))
            ).alias(count_col),
        )
    return merged.filter(F.col(count_col) != 0)
