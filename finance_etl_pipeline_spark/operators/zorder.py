"""Z-order (Morton-curve) write layout for multi-column data skipping.

Single-column sorting gives tight parquet row-group min/max stats on
ONE column; a range predicate on any other column finds every group
overlapping and prunes nothing.  Interleaving the bits of several
quantized sort keys (the Morton code) makes runs of rows cluster in
ALL participating dimensions at once, so 2-D box predicates — and
single-column ranges on either dimension — both skip most row groups.
The same layout trick underlies Delta/Iceberg `OPTIMIZE ZORDER BY`;
here it is a pure DataFrame transform over plain Parquet.

Pipeline: per-column min/max (one tiny aggregate, broadcast back) →
linear quantization to ``bits``-bit grid cells → bit interleave (a
closed-form shift/or expression, fully codegen'd) → range-partition +
sort by the code.  At 100 TB the only data movement is the final
range exchange, which any global sort needs anyway; everything before
it is a narrow map.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def quantize(c: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Scale a numeric column to integer grid cells [0, 2^bits).
    Constant columns (mx == mn) map to cell 0 (the when-guard keeps
    the division ANSI-safe)."""
    cells = 2**bits
    scaled = F.floor(
        (c - mn).cast("double") / (mx - mn).cast("double") * cells
    )
    bounded = F.least(F.lit(cells - 1), F.greatest(F.lit(0), scaled))
    return F.when(mx > mn, bounded).otherwise(F.lit(0)).cast("long")


def morton_code(cells: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of each cell index round-robin
    (bit i of column j lands at position i*ncols + j) — the Morton /
    Z-curve address.  Pure shifts and ORs with literal distances, so
    the whole code stays inside WholeStageCodegen."""
    n = len(cells)
    parts = [
        F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, cell in enumerate(cells)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` globally ordered along the Z-curve of ``cols``
    (range-partitioned + sorted, helper column dropped).  Write the
    result with small-enough row groups and 2-D box predicates skip
    most of them — see tests/test_zorder.py for the footer-level
    proof."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    cells = [
        quantize(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    coded = with_stats.withColumn("__z", morton_code(cells, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    # always range-partition so the order is GLOBAL along the curve —
    # sortWithinPartitions alone would leave every pre-existing
    # partition spanning the full z-range and prune nothing; with no
    # explicit count, repartitionByRange uses spark.sql.shuffle
    # .partitions (AQE may coalesce)
    if num_partitions is not None:
        coded = coded.repartitionByRange(num_partitions, "__z")
    else:
        coded = coded.repartitionByRange("__z")
    return coded.sortWithinPartitions("__z").drop("__z")
