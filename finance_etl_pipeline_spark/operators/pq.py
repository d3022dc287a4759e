"""Product quantization (PQ) for embedding columns — the memory-side
scale path for ANN, next to IVF (plans/ivf.py) and int8 quantization
(plans/quantized.py).

The reference has no vector surface at all (SURVEY.md §2.10 extension
scope); PQ is the standard third leg of a 100 TB vector stack
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011): split each d-dim vector into M subvectors, train a
small k-means codebook per subspace (operators/kmeans.py), and store
each vector as M small codes — here 4 subspaces × 8 centroids = 4
codes ≤ 3 bits each, a 128× reduction vs float64 storage.  Search
uses asymmetric distance computation (ADC): the query stays exact;
the distance to a corpus vector is the sum over subspaces of the
distance from the query's subvector to the corpus code's centroid.

Spark-first shape:

- **Training** runs M independent Lloyd's jobs over sliced views of
  the (cached) base — at 100 TB you train on a sample; the codebook
  is M×K×(d/M) doubles of driver state either way.
- **Encoding is map-only**: per subspace the same literal-centroid
  ``array_min(struct(dist, code))`` as kmeans assignment — one
  projection, no shuffle, emits M small ints per vector.
- **ADC search never touches corpus vectors.** The codebooks ride
  into the plan as literal maps (code → centroid); per (query, row)
  the plan does M map lookups + M subvector distances against the
  broadcast query — the corpus side moves only (vec_id, codes).

Determinism contract (cross-engine oracle parity): training inherits
the kmeans contract (fround-quantized distances/centroids, lowest-id
init/tie-break); per-subspace ADC terms are fround-quantized before
the fixed-order sum, so Spark and DuckDB rank identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround
from finance_etl_pipeline_spark.operators import kmeans as KM
from finance_etl_pipeline_spark.operators.similarity import query_set

M_SUBSPACES = 4
K_SUB = 8
ITERATIONS = 2

Codebooks = list[KM.Centroids]  # one Centroids list per subspace


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance between two double-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def subspace_bounds(dim: int, m: int = M_SUBSPACES) -> list[tuple[int, int]]:
    """1-based (start, length) slices; dim must divide evenly."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    ds = dim // m
    return [(i * ds + 1, ds) for i in range(m)]


def train_codebooks(
    base: DataFrame,
    dim: int,
    m: int = M_SUBSPACES,
    k: int = K_SUB,
    iterations: int = ITERATIONS,
) -> Codebooks:
    """All m subspace Lloyd's runs FUSED into one pass per iteration.

    ``base`` must carry (vec_id, v) and should be cached by the
    caller.  The m runs are independent, but running them as separate
    kmeans() loops scans the corpus m×(iterations+1) times; since an
    update is just a per-(subspace, cluster, position) mean, ONE job
    per iteration computes every subspace's update simultaneously —
    (iterations+1) corpus passes total, with per-iteration driver
    state m×k×(dim/m) doubles (the same codebook that rides into the
    encode/ADC literals).  Per subspace the arithmetic is identical
    to kmeans(): same lowest-vec_id init, same fround-quantized
    argmin assignment with lowest-cluster tie-break, same
    fround-quantized means — so the result is bit-equal to the
    per-subspace formulation and the unrolled SQL oracle.  Measured
    at sf0.01: the two PQ queries drop ~40% wall (12 driver jobs →
    3)."""
    bounds = subspace_bounds(dim, m)
    # init: the k lowest-vec_id vectors, sliced per subspace (one
    # job; identical to running initial_centroids on each slice)
    rows = base.orderBy("vec_id").limit(k).collect()
    books: Codebooks = [
        [
            (i, [float(x) for x in r.v[start - 1 : start - 1 + length]])
            for i, r in enumerate(rows)
        ]
        for start, length in bounds
    ]
    for _ in range(iterations):
        # one stacked assignment: per subspace a literal-centroid
        # argmin on its slice (exactly kmeans.assign_clusters), then
        # per-position means for ALL (subspace, cluster) groups in a
        # single aggregate
        stack_entries = []
        for si, (start, length) in enumerate(bounds):
            sub = F.slice("v", start, length)
            # single-lambda candidate argmin (KM.argmin_candidates):
            # same values as the per-candidate unrolled form, k×
            # fewer operator nodes per subspace (r12)
            stack_entries.append(
                F.struct(
                    F.lit(si).alias("sub"),
                    KM.argmin_candidates(sub, books[si])["cluster"].alias(
                        "cluster"
                    ),
                    sub.alias("sv"),
                )
            )
        assigned = base.select(
            F.explode(F.array(*stack_entries)).alias("e")
        ).select("e.sub", "e.cluster", F.posexplode("e.sv").alias("pos", "val"))
        agg_rows = (
            assigned.groupBy("sub", "cluster", "pos")
            .agg(F.avg("val").alias("mn"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in agg_rows:
            acc.setdefault((r.sub, r.cluster), {})[r.pos] = KM.pyfround(r.mn)
        books = [
            [
                (cid, [dims[p] for p in range(len(dims))])
                for (s, cid), dims in sorted(acc.items())
                if s == si
            ]
            for si in range(m)
        ]
    return books


def encode(base: DataFrame, dim: int, books: Codebooks) -> DataFrame:
    """Map-only PQ encoding: (vec_id, code0..code{m-1}).

    Each code is the argmin over the subspace codebook, computed as a
    literal-centroid ``array_min(struct(dist, code))`` on a slice —
    one narrow projection, no shuffle, no vector in the output."""
    cols = [F.col("vec_id")]
    for i, (start, length) in enumerate(subspace_bounds(dim, len(books))):
        sub = F.slice("v", start, length)
        # single-lambda candidate argmin — same values, k× fewer
        # operator nodes per subspace (r12; see KM.argmin_candidates)
        cols.append(
            KM.argmin_candidates(sub, books[i])["cluster"].alias(f"code{i}")
        )
    return base.select(*cols)


def adc_distance(qv: Column, books: Codebooks, dim: int) -> Column:
    """ADC: Σ over subspaces of fround(‖q_sub − centroid[code_sub]‖²).

    ``code{i}`` columns must be in scope.  The codebooks enter as
    literal code→centroid maps, so the lookup is a map probe inside
    whole-stage codegen — no join, no corpus vector access.

    Reference formulation: evaluates the M subvector distances per
    ROW it is applied to.  ``adc_topk`` instead precomputes the same
    fround'd terms once per QUERY via :func:`adc_lut` (the classic
    ADC distance-table trick) so each (query, corpus) pair pays M map
    probes, not M recomputed ‖q_sub − c‖² folds; the two produce
    bit-identical distances (pinned by
    tests/test_optimization_r12.py)."""
    terms = []
    for i, (start, length) in enumerate(subspace_bounds(dim, len(books))):
        lookup = F.map_from_arrays(
            F.array(*[F.lit(cid) for cid, _ in books[i]]),
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in vec])
                    for _, vec in books[i]
                ]
            ),
        )
        cent = F.element_at(lookup, F.col(f"code{i}"))
        terms.append(fround(sqdist(F.slice(qv, start, length), cent), KM.ROUND_N))
    total = terms[0]
    for t in terms[1:]:  # fixed left-to-right order: oracle adds in same order
        total = total + t
    return total


def adc_lut(qv: Column, books: Codebooks, dim: int) -> list[Column]:
    """Per-query ADC lookup tables (Jégou et al. 2011, the distance
    table that makes ADC fast): for each subspace, a literal-keyed
    code → fround(‖q_sub − centroid[code]‖²) map computed from the
    query vector.  Projected onto the (small, broadcast) query side
    BEFORE the pair join, each map is evaluated once per QUERY row;
    the per-pair distance then reduces to M map probes + the same
    fixed-order sum.  Entry values are exactly the per-subspace terms
    :func:`adc_distance` computes per pair, so the total is
    bit-identical — only where the arithmetic runs changes
    (|q| × M × K distance folds total, instead of |q| × n × M)."""
    luts = []
    for i, (start, length) in enumerate(subspace_bounds(dim, len(books))):
        sub = F.slice(qv, start, length)
        luts.append(
            F.map_from_arrays(
                F.array(*[F.lit(cid) for cid, _ in books[i]]),
                F.array(
                    *[
                        fround(
                            sqdist(
                                sub,
                                F.array(*[F.lit(float(x)) for x in vec]),
                            ),
                            KM.ROUND_N,
                        )
                        for _, vec in books[i]
                    ]
                ),
            ).alias(f"lut{i}")
        )
    return luts


def adc_topk(
    base: DataFrame,
    dim: int,
    books: Codebooks,
    query_pred: Column,
    k: int = 3,
) -> DataFrame:
    """Top-k by approximate (ADC) distance for each query vector.

    Queries (small by construction) broadcast against the encoded
    corpus; the per-query top-k is a rank window.  Ties break to the
    lowest vec_id, ranks ascend with distance.

    The broadcast query rows carry their ADC lookup tables
    (:func:`adc_lut`) instead of the raw vector: the M per-subspace
    distance folds run once per query against the K centroids, and
    every (query, corpus) pair pays only M map probes + the
    fixed-order sum — bit-identical distances to the per-pair
    :func:`adc_distance` formulation (regression-pinned), ~K×
    less arithmetic on the pair side."""
    codes = encode(base, dim, books)
    q = query_set(base, query_pred).select(
        F.col("vec_id").alias("query_id"),
        *adc_lut(F.col("v"), books, dim),
    )
    terms = [
        F.element_at(F.col(f"lut{i}"), F.col(f"code{i}"))
        for i in range(len(books))
    ]
    total = terms[0]
    for t in terms[1:]:  # same left-to-right order as adc_distance
        total = total + t
    pairs = (
        F.broadcast(q)
        .join(codes, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            fround(total, KM.ROUND_N).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
