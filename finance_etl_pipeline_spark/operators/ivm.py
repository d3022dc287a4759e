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
