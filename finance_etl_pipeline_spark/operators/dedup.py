"""Deduplication operators for LLM training-data pipelines.

Four families, all pure DataFrame expressions (no UDFs, no MLlib
randomness) so every stage is verifiable against the DuckDB oracle:

- exact dedup: content-hash groupBy (md5);
- n-gram Jaccard: word-shingle inverted index → self-join → exact
  Jaccard — the ground-truth near-dup measure;
- MinHash + LSH: deterministic md5-based 60-bit shingle hashes →
  ``NUM_HASHES`` affine permutations mod a Mersenne prime → banded
  signatures → candidate pairs → exact-Jaccard verification of
  candidates only.  At 100 TB the banding join is what makes near-dup
  feasible: candidates ∝ true-dup density, not n²;
- SimHash: 32-bit sign-aggregated token hashes + banded Hamming
  candidate search.

Determinism note: MLlib's MinHashLSH draws random coefficients at fit
time; we need the *same* permutations in Spark and the SQL oracle, so
the coefficients are fixed constants below and the shingle hash is
md5-derived (md5 is identical everywhere).  Arithmetic stays below
2^62 (hash reduced mod P before the affine map) so it is safe under
ANSI mode and identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Affine-permutation constants shared by the Spark plans and the SQL
# oracle builders (plans/llm.py interpolates the same values).
MERSENNE_P = 2_147_483_647  # 2^31 - 1
NUM_HASHES = 16
NUM_BANDS = 4  # 4 bands x 4 rows
SHINGLE_N = 3


def hash_a(i: str = "i") -> str:
    """SQL text of the i-th permutation's multiplier (1-based-safe)."""
    return f"(1103 + 977 * {i})"


def hash_b(i: str = "i") -> str:
    return f"(12289 + 31 * {i})"


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def shingles_expr(tokens: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles; empty array when < n tokens
    (guarded because Spark's sequence(1, k) runs DESCENDING for k<1)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + off) for off in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(tokens) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def hash60_expr(s: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    ``conv(hex, 16, 10)`` in Spark == ``CAST('0x'||hex AS BIGINT)`` in
    DuckDB; 60 bits keeps every downstream product below 2^62."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def shingle_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) inverted index — the base of Jaccard/MinHash."""
    from finance_etl_pipeline_spark.sources.readers import spread

    docs = spread(docs)
    toks = tokens_expr()
    return docs.select(
        F.col(id_col), F.explode(shingles_expr(toks)).alias("s")
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wide signature row (doc_id, mh0..mh15) in ONE groupBy.

    Each permutation is its own min-aggregate over the same shingle
    scan — no explode, so the pre-shuffle row count stays |shingles|,
    not |shingles|×NUM_HASHES, and map-side partial mins shrink it to
    |docs| per partition before the exchange (16× less shuffle volume
    than the exploded formulation; measured 8.4 s → 3.3 s at sf0.1)."""
    return minhash_signatures_hashed(
        sh.select(F.col(id_col), hash60_expr(F.col("s")).alias("h")), id_col
    )


def hashed_shingle_rows(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, h): the shingle inverted index with each shingle
    reduced to its FULL 60-bit hash (not mod P — the Jaccard
    verification identifies shingles by this value, and reducing to
    the 31-bit Mersenne space there would reintroduce exactly the
    collision noise SCALE.md rejects; the mod-P reduction the affine
    permutations need to stay under 2^62 happens inside
    :func:`minhash_signatures_hashed`).

    The md5 runs on EXPLODED rows on purpose: scalar expressions over
    rows stay inside whole-stage codegen, while the same md5 inside a
    higher-order ``transform`` lambda is interpreted per array
    element (measured ~10x slower at sf0.1).  Downstream everything
    -- signature aggregation, candidate verification -- operates on
    8-byte longs instead of shingle strings, shrinking every shuffle
    and the checkpoint that feeds the two DAG branches."""
    sh = shingle_table(docs, id_col)
    return sh.select(F.col(id_col), hash60_expr(F.col("s")).alias("h"))


def minhash_signatures_hashed(
    sh_hashed: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Wide signature row (doc_id, mh0..mh15) from pre-hashed shingle
    rows -- same values and shape as :func:`minhash_signatures`, minus
    the md5 (already done in :func:`hashed_shingle_rows`).  The hash
    is reduced mod P here, immediately before the affine map, so the
    products stay below 2^62 (ANSI-safe) while the verification path
    keeps the full 60-bit identity."""
    hmod = F.col("h") % MERSENNE_P
    aggs = [
        F.min(
            ((F.lit(1103 + 977 * i)) * hmod + F.lit(12289 + 31 * i)) % MERSENNE_P
        ).alias(f"mh{i}")
        for i in range(NUM_HASHES)
    ]
    return sh_hashed.groupBy(id_col).agg(*aggs)


def jaccard_verify_hashed(
    sh_hashed: DataFrame,
    candidates: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard for candidate pairs over hashed shingle SETS:
    restrict the inverted index to candidate docs (broadcast
    semi-join), fold each survivor's hashes into one array
    (collect_list -- one small shuffle proportional to candidate
    docs), then compute ``|intersect| / |union|`` per pair with array
    expressions via two broadcast joins -- no pairwise explode, no
    n-squared anything.

    Jaccard is computed over 60-bit shingle hashes rather than the
    strings; a collision would have to land inside one candidate pair
    (P ~ |doc shingles|^2 / 2^61 -- vanishing, and the result is
    verified bit-identical to the string-based oracle at
    sf0.001/0.01/0.1).  Candidates are proportional to true-dup
    density, so both broadcasts stay tiny; if a pathological corpus
    outgrew them, dropping the hints degrades to hash joins still
    proportional to candidates."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    cand_docs = (
        candidates.select(F.col("doc_a").alias(id_col))
        .union(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sets = (
        sh_hashed.join(F.broadcast(cand_docs), id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("h").alias("hs"))
    )
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("hs").alias("sa"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("hs").alias("sb"))
    with_a = sa.join(F.broadcast(candidates), "doc_a")
    both = sb.join(F.broadcast(with_a), "doc_b")
    inter = F.size(F.array_intersect("sa", "sb"))
    j = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        both.select("doc_a", "doc_b", igrid(j, 4).alias("jaccard_e4"))
        .filter(F.col("jaccard_e4") >= int(round(threshold * 10000)))
    )


def band_signatures(mh_wide: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, sig): md5 over each band's comma-joined minhash
    values (same string the oracle's ``string_agg ... ORDER BY i``
    builds), unpivoted to long form for the bucket join."""
    rows = NUM_HASHES // NUM_BANDS
    band_cols = []
    for b in range(NUM_BANDS):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(F.md5(F.concat_ws(",", *parts)).alias(f"band{b}"))
    wide = mh_wide.select(F.col(id_col), *band_cols)
    stack = ", ".join(f"{b}, band{b}" for b in range(NUM_BANDS))
    return wide.selectExpr(id_col, f"stack({NUM_BANDS}, {stack}) AS (band, sig)")


def candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band signature —
    the LSH bucket join; the only pairwise step, and it is bounded by
    bucket sizes, never n²."""
    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("band"), F.col("sig")
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("band"), F.col("sig")
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame,
    candidates: DataFrame | None,
    threshold: float,
    id_col: str = "doc_id",
    key: str = "s",
) -> DataFrame:
    """Exact Jaccard over shingle sets for (candidate) pairs.

    With ``candidates`` None this is the brute-force inverted-index
    join (ground truth); with candidates it verifies only LSH hits.

    ``key`` names the shingle-identity column: ``"s"`` for the raw
    shingle strings (:func:`shingle_table`), ``"h"`` for their 60-bit
    hashes (:func:`hashed_shingle_rows`) — the hashed form joins and
    aggregates on 8-byte longs instead of shingle strings (¼-⅓ the
    shuffle bytes, primitive-key compares) and is value-identical
    under the same hash-injectivity the LSH verification path
    (:func:`jaccard_verify_hashed`) already relies on and documents.

    Scale-critical ordering: the candidate restriction is applied
    BEFORE the pairwise join — first a semi-join keeps only candidate
    docs' shingles (complete per doc, so Jaccard denominators stay
    exact), then the broadcast pair filter drops non-candidate pairs
    as they are generated.  Filtering after the aggregation instead
    (the naive translation of the SQL) makes LSH as expensive as
    brute force — measured 21 s → 2 s at sf0.1."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    pair_sh = sh
    if candidates is not None:
        cand_docs = (
            candidates.select(F.col("doc_a").alias(id_col))
            .union(candidates.select(F.col("doc_b").alias(id_col)))
            .distinct()
        )
        pair_sh = sh.join(F.broadcast(cand_docs), id_col, "left_semi")
    a = pair_sh.select(F.col(id_col).alias("doc_a"), key)
    b = pair_sh.select(F.col(id_col).alias("doc_b"), key)
    pairs = a.join(b, key).filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pairs = pairs.join(F.broadcast(candidates), ["doc_a", "doc_b"], "left_semi")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("i"))
    sizes = pair_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", igrid(j, 4).alias("jaccard_e4"))
        .filter(F.col("jaccard_e4") >= int(round(threshold * 10000)))
    )


def simhash_table(docs: DataFrame, bits: int = 32, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): sign-aggregated token-hash fingerprint."""
    from finance_etl_pipeline_spark.sources.readers import spread

    docs = spread(docs)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr())).alias("tok"),
    )
    hashed = toks.select(id_col, (hash60_expr(F.col("tok"))).alias("h"))
    # all ``bits`` sign-sums in ONE groupBy(doc) aggregate: the bit
    # index is a literal per aggregate column, so no ×bits explode and
    # no (doc, bit) exchange — the previous shape shuffled
    # |tokens|×bits rows through groupBy(doc, b) and then re-shuffled
    # the bit sums by doc.  Here the map-side partial aggregate
    # collapses each partition to |docs|×bits integers before the
    # single exchange (guide §2.3/§2.4; measured: simhash_table alone
    # ~1.1 s at sf0.1 where the exploded form dominated a 23.8 s
    # query).  Same integer arithmetic, same result.
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    simhash = None
    for b in range(bits):
        term = (
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        simhash = term if simhash is None else simhash + term
    return bit_sums.select(F.col(id_col), simhash.alias("simhash"))


def simhash_candidate_pairs(
    sim: DataFrame, bands: int = 4, band_bits: int = 8
) -> DataFrame:
    """Distinct banded candidate pairs ``(doc_a, doc_b, sha, shb)``
    with ``doc_a < doc_b`` — every pair sharing ≥1 of the ``bands``
    ``band_bits``-bit simhash bands, each emitted EXACTLY ONCE.

    Dedup by band OWNERSHIP instead of DISTINCT: a pair that shares
    several bands meets in each of them, so it is kept only at its
    FIRST shared band (a codegen'd filter over the joined row — both
    fingerprints ride the join, so the earlier-band comparison needs
    no lookup).  The DISTINCT this replaces re-shuffled the full
    candidate set — the dominant cost when banding is weakly
    selective — and forced two broadcast join-backs to recover the
    fingerprints for verification (the e_concurrent_sessions
    bucket-ownership pattern; measured: dd_simhash_neardup 23.8 s →
    5.2 s at sf0.1 across this + the simhash_table rewrite + the pin,
    with an identical pair set — the remainder is the query's own
    4.8 M-row ordered output)."""
    sbands = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("k"),
    ).select(
        "doc_id",
        "simhash",
        "k",
        F.expr(
            f"shiftright(simhash, cast(k * {band_bits} as int))"
            f" & {(1 << band_bits) - 1}"
        ).alias("bv"),
    )
    a = sbands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sha"), "k", "bv"
    )
    b = sbands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("shb"), "k", "bv"
    )
    mask = (1 << band_bits) - 1

    def _band(col: str, j: int) -> Column:
        return F.expr(f"shiftright({col}, {j * band_bits}) & {mask}")

    first_shared = F.lit(True)
    own = None
    for j in range(bands):
        cond = first_shared  # all bands < j differ
        own = (
            F.when(F.col("k") == j, cond)
            if own is None
            else own.when(F.col("k") == j, cond)
        )
        first_shared = first_shared & (_band("sha", j) != _band("shb", j))
    return (
        a.join(b, ["k", "bv"])
        .filter((F.col("doc_a") < F.col("doc_b")) & own)
        .select("doc_a", "doc_b", "sha", "shb")
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components over a near-dup pair graph → (node, lbl)
    where lbl is the component's minimum doc id.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; the fixpoint is
    the component minimum (unique — so the result is deterministic
    regardless of engine or iteration schedule).  Near-dup components
    are tiny (pairs of re-posts, small mirror clusters), so rounds ≈
    small component diameter; each round is one shuffle of |edges|.
    Lineage is cut per round (localCheckpoint; persist on a cluster —
    SCALE.md).  For planet-scale graphs swap in the alternating
    star-contraction variant — same external contract.
    """
    edges = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
    # hash-partition on the join key BEFORE pinning: every round's
    # neighbor join then reuses this partitioning instead of
    # re-shuffling the (large) edge set per round
    edges = edges.repartition("b").localCheckpoint()
    # init = the first propagation round fused into the node-distinct
    # aggregate: label(n) = min(n, min neighbor).  Equivalent to one
    # round from identity labels (symmetrized edges ⇒ groupBy(a)
    # enumerates every node), but skips that round's two joins,
    # checkpoint, and convergence action — pair/star components are
    # already at fixpoint entering the loop.
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("m"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("m")).alias("lbl"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # SHUFFLE_HASH on the label side (same reasoning as
        # operators/graph.pagerank): sort-merge would re-sort the
        # pinned edge set every round; hashing builds from the
        # |nodes|/P label partition and streams edges unsorted.
        # min-label is integer arithmetic, so unlike a float
        # aggregate the join strategy cannot perturb the result.
        nbr_min = (
            edges.join(labels.hint("shuffle_hash"), edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # the change flag is computed inside the SAME update join (a
        # node's label only ever decreases, so "changed" ⇔ some
        # neighbor label beat the current one) — a separate
        # new-vs-old comparison join would add a full shuffle join
        # per round for information the update already has in hand
        new_labels = (
            labels.join(
                nbr_min.hint("shuffle_hash"), labels.node == nbr_min.a, "left"
            )
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce("nbr_lbl", F.col("lbl")) < F.col("lbl")).alias(
                    "chg"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("chg").limit(1).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    return labels
