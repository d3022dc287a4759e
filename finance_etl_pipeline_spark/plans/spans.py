"""Repeated-span (substring-level) deduplication profiling.

Document-level dedup (exact md5, MinHash, SimHash) misses the most
damaging duplication mode in web-scale training corpora: long VERBATIM
SPANS repeated across otherwise-distinct documents (boilerplate,
licence blocks, quoted passages).  Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better") remove repeated
substrings above a length threshold with a suffix array; the
distributed re-expression here is rolling fixed-width token windows:

- every position i of every document contributes the hash of the
  8-token window starting at i (stride 1, positions kept — unlike
  MinHash shingles these are NOT distinct: coverage needs positions);
- a window hash seen in ≥ 2 distinct documents marks a cross-document
  repeated span at that position;
- per document, the marked positions are merged gaps-and-islands
  style (two marked positions overlap while they are < 8 apart) into
  maximal covered intervals, whose union length is the number of
  duplicated TOKENS — the fraction Lee et al. would cut.

Spark shape (100 TB posture): the window table is one narrow
map+posexplode over documents (rows ∝ corpus tokens, no shuffle);
cross-doc duplication is a groupBy(hash) with a distinct-doc count
(map-side combined, high-cardinality key — no skew); the join back is
co-keyed on the same hash; everything after (island merge, coverage)
runs only on DUPLICATED positions — proportional to duplication
density, not corpus size.  The 60-bit md5 window hash makes a
cross-pair collision vanishing (same argument as the MinHash index).

Reference basis: extends /root/reference's dedup surface (absent
there) per the LLM-pipeline mandate; same banded-index posture as
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid, sql_hash60, sql_igrid
from finance_etl_pipeline_spark.operators.dedup import hash60_expr, tokens_expr
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

SPAN_W = 8  # tokens per rolling window


def _windows_sql() -> str:
    """(doc_id, pos, h): every rolling SPAN_W-token window, 1-based."""
    cat = " || ' ' || ".join(f"t[i+{k}]" for k in range(SPAN_W))
    return f"""
    tokd AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id, i AS pos, {sql_hash60(f"({cat})")} AS h
      FROM tokd, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - {SPAN_W - 1}, 0))) AS i
      )
    )"""


@register(
    "dd_repeated_spans",
    f"""
    WITH {_windows_sql()},
    hd AS (
      SELECT h FROM (
        SELECT h, count(DISTINCT doc_id) AS nd FROM win GROUP BY h
      ) WHERE nd >= 2
    ),
    dup AS (SELECT DISTINCT w.doc_id, w.pos FROM win w JOIN hd USING (h)),
    brk AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + {SPAN_W - 1}
                  THEN 1 ELSE 0 END AS is_new
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM brk
    ),
    cov AS (
      SELECT doc_id, grp,
             max(pos) + {SPAN_W} - min(pos) AS covered,
             count(*) AS n_dup_windows
      FROM isl GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(covered) AS BIGINT) AS dup_tokens,
             CAST(sum(n_dup_windows) AS BIGINT) AS n_dup_windows,
             count(*) AS n_spans
      FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           d.n_spans, d.n_dup_windows, d.dup_tokens,
           {sql_igrid('CAST(d.dup_tokens AS DOUBLE) / len(t.t)', 6)}
             AS dup_fraction_e6
    FROM per_doc d JOIN tokd t USING (doc_id)
    ORDER BY doc_id
    """,
    "llm",
    "dedup",
    "spans",
    "bench",
)
def dd_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span profile — see module docstring.
    Emits, per document that shares at least one 8-token span with
    another document: the number of maximal repeated spans, the
    marked window positions, and the duplicated-token count/fraction
    (interval-union coverage, not double-counted overlaps)."""
    docs = spread(table(spark, sf_dir, "documents"))
    # materialize the token array ONCE per row before the window
    # lambda — inlining tokens_expr() inside transform() re-splits the
    # text for every element_at (no CSE through lambda scopes):
    # measured 28.8 s → ~1 s for the window explode at sf0.1
    base = docs.select("doc_id", tokens_expr().alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.size(t) - (SPAN_W - 1))
    windows = F.when(
        F.size(t) >= SPAN_W,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, SPAN_W))),
    ).otherwise(F.array().cast("array<string>"))
    # the explode stays INLINE in the same select as its siblings: an
    # intermediate projection that materializes the window array as a
    # named column before a separate posexplode defeats the
    # project-into-generator fusion and re-measured 8x slower
    # (2.8 s vs 0.36 s for this stage at sf0.1).
    # The window index feeds BOTH DAG branches (duplicated-hash set +
    # position join-back); eager localCheckpoint materializes the
    # md5 explode once — same rationale, measurements, and cluster
    # caveat (prefer persist(DISK_ONLY)) as dd_minhash_lsh_pairs'
    # shingle index
    win = (
        base.select(
            "doc_id",
            F.size(t).alias("n_tokens"),
            F.posexplode(windows).alias("p0", "w"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("p0") + 1).alias("pos"),
            hash60_expr(F.col("w")).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    hd = (
        win.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup = (
        win.join(hd, "h", "left_semi")
        .select("doc_id", "n_tokens", "pos")
        .distinct()
    )
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    brk = dup.withColumn(
        "is_new",
        F.when(
            F.lag("pos").over(w_ord).isNull()
            | (F.col("pos") > F.lag("pos").over(w_ord) + (SPAN_W - 1)),
            1,
        ).otherwise(0),
    )
    isl = brk.withColumn(
        "grp",
        F.sum("is_new").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    cov = isl.groupBy("doc_id", "n_tokens", "grp").agg(
        (F.max("pos") + SPAN_W - F.min("pos")).alias("covered"),
        F.count(F.lit(1)).alias("n_dup_windows"),
    )
    per_doc = cov.groupBy("doc_id", "n_tokens").agg(
        F.sum("covered").cast("long").alias("dup_tokens"),
        F.sum("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_spans",
        "n_dup_windows",
        "dup_tokens",
        F.floor(
            F.col("dup_tokens").cast("double") / F.col("n_tokens") * 1000000
            + 0.5001
        )
        .cast("long")
        .alias("dup_fraction_e6"),
    ).orderBy("doc_id")


def _mh_estimate_sql() -> str:
    from finance_etl_pipeline_spark.operators import dedup as D
    from finance_etl_pipeline_spark.plans import REGISTRY

    exact = REGISTRY["dd_ngram_jaccard_pairs"].oracle
    # DuckDB twin of the minhash signature + band CTEs (identical
    # constants to operators/dedup.py — same text dd_minhash uses)
    _P = D.MERSENNE_P
    sh = """SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(t)-2, 0)),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
       FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
             FROM documents)"""
    return f"""
    WITH sh AS ({sh}),
    hashes AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {_P} AS hmod
      FROM sh
    ),
    mh AS (
      SELECT doc_id, i,
             min(({D.hash_a('i')} * hmod + {D.hash_b('i')}) % {_P}) AS mh
      FROM hashes, range(0, {D.NUM_HASHES}) t(i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {D.NUM_HASHES // D.NUM_BANDS} AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS sig
      FROM mh GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    agree AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sig_match
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.doc_a
      JOIN mh mb ON mb.doc_id = c.doc_b AND mb.i = ma.i
      GROUP BY c.doc_a, c.doc_b
    ),
    exact AS (SELECT doc_a, doc_b, jaccard_e4 FROM ({exact}))
    SELECT a.doc_a, a.doc_b, a.n_sig_match,
           CAST(floor(a.n_sig_match / {D.NUM_HASHES}.0 * 10000 + 0.5001) AS BIGINT)
             AS est_jaccard_e4,
           e.jaccard_e4 AS exact_jaccard_e4,
           CAST(floor(a.n_sig_match / {D.NUM_HASHES}.0 * 10000 + 0.5001) AS BIGINT)
             - coalesce(e.jaccard_e4, 0) AS err_e4
    FROM agree a LEFT JOIN exact e
      ON a.doc_a = e.doc_a AND a.doc_b = e.doc_b
    ORDER BY a.doc_a, a.doc_b
    """


@register(
    "dd_minhash_estimate_calibration",
    _mh_estimate_sql(),
    "llm",
    "dedup",
    "eval",
)
def dd_minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATOR calibration: for every LSH candidate
    pair, the fraction of the 16 minhash values that agree (the
    classical unbiased Jaccard estimate) side by side with the exact
    shingle-set Jaccard (null → the pair is a band-collision false
    candidate below the 0.7 threshold) and the signed error.  This is
    the per-pair view behind dd_lsh_recall_eval's aggregate scorecard
    — the diagnostic for choosing NUM_HASHES/bands on a new corpus.

    Scale: candidate-bounded everywhere — the signature table is
    semi-join-restricted to the docs that appear in at least one
    candidate pair BEFORE the agreement join (the same trick
    operators/dedup.py jaccard_verify_hashed uses on the shingle
    index), so the broadcast side is ∝ candidate count, never the
    full corpus; the exact side is the already-candidate-restricted
    verifier.  Nothing is pairwise beyond the LSH buckets."""
    from finance_etl_pipeline_spark.operators import dedup as D
    from finance_etl_pipeline_spark.plans import REGISTRY

    docs = table(spark, sf_dir, "documents")
    sh_hashed = D.hashed_shingle_rows(docs).localCheckpoint(eager=True)
    mh_wide = D.minhash_signatures_hashed(sh_hashed)
    bands = D.band_signatures(mh_wide)
    # pinned: consumed by cand_docs (twice), the agreement join, AND
    # jaccard_verify_hashed's three internal scans — seven subplans
    # that would each re-run the signature+band chain unpinned
    cand = D.candidate_pairs(bands).localCheckpoint(eager=False)
    n_match = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0)
        for i in range(D.NUM_HASHES)
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # candidate-restricted signatures: the broadcast side is ∝ the
    # number of candidate docs (dup density), never the full corpus
    mh_cand = mh_wide.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    ma = mh_cand.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(D.NUM_HASHES)],
    )
    mb = mh_cand.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(D.NUM_HASHES)],
    )
    agree = (
        cand.join(F.broadcast(ma), "doc_a")
        .join(F.broadcast(mb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_match.cast("long").alias("n_sig_match"),
        )
    )
    est = F.floor(
        F.col("n_sig_match") / float(D.NUM_HASHES) * 10000 + 0.5001
    ).cast("long")
    exact = D.jaccard_verify_hashed(sh_hashed, cand, 0.7).select(
        "doc_a", "doc_b", F.col("jaccard_e4").alias("exact_jaccard_e4")
    )
    return (
        agree.join(exact, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "n_sig_match",
            est.alias("est_jaccard_e4"),
            "exact_jaccard_e4",
            (est - F.coalesce("exact_jaccard_e4", F.lit(0))).alias("err_e4"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _cluster_hist_sql() -> str:
    from finance_etl_pipeline_spark.plans import REGISTRY

    clusters = REGISTRY["dd_dedup_clusters"].oracle
    return f"""
    WITH c AS (SELECT cluster_id FROM ({clusters})),
    sizes AS (SELECT cluster_id, count(*) AS sz FROM c GROUP BY cluster_id)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz - 1) AS BIGINT) AS n_droppable
    FROM sizes GROUP BY sz ORDER BY sz
    """


@register(
    "dd_cluster_size_histogram",
    _cluster_hist_sql(),
    "llm",
    "dedup",
    "profile",
)
def dd_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution: how many connected
    components of each size the corpus carries and how many documents
    a keep-one-per-cluster policy would drop (size − 1 per cluster) —
    the capacity-planning readout before executing a dedup pass (a
    heavy tail of giant clusters means boilerplate, not true
    near-dups, and argues for span-level dedup instead).

    Spark: composes the verified connected-components labeling
    (`dd_dedup_clusters`) with two tiny aggregates over |clustered
    docs| rows."""
    from finance_etl_pipeline_spark.plans import REGISTRY

    labels = REGISTRY["dd_dedup_clusters"].fn(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("long").alias("n_droppable"),
        )
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            "n_droppable",
        )
        .orderBy("cluster_size")
    )


def _simhash_hist_sql() -> str:
    # identical fingerprint/band CTE chain as dd_simhash_neardup —
    # same constants, unfiltered candidate distances
    from finance_etl_pipeline_spark.functions.scalars import sql_hash60

    h60 = sql_hash60("tok")
    return f"""
    WITH tokd AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, {h60} AS h FROM tokd),
    bits AS (
      SELECT doc_id, i AS b,
             sum(((h >> CAST(i AS INTEGER)) & 1) * 2 - 1) AS sgn
      FROM th, range(0, 32) t(i)
      GROUP BY doc_id, i
    ),
    sim AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN sgn > 0
                      THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                      ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ),
    sbands AS (
      SELECT doc_id, k, (simhash >> CAST(k * 8 AS INTEGER)) & 255 AS bv
      FROM sim, range(0, 4) t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sbands a JOIN sbands b
        ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    dist AS (
      SELECT CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
      FROM cand
      JOIN sim sa ON doc_a = sa.doc_id
      JOIN sim sb ON doc_b = sb.doc_id
    )
    SELECT hamming, count(*) AS n_pairs,
           CAST(sum(count(*)) OVER (ORDER BY hamming
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_pairs
    FROM dist GROUP BY hamming ORDER BY hamming
    """


@register(
    "dd_simhash_hamming_histogram",
    _simhash_hist_sql(),
    "llm",
    "dedup",
    "profile",
)
def dd_simhash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash threshold calibration: the Hamming-distance histogram
    over ALL banded candidate pairs (no ≤6 cut) with cumulative pair
    counts — read off how many pairs each candidate threshold would
    accept before committing to one, exactly as
    ``emb_threshold_calibration`` calibrates the cosine cut and
    ``dd_minhash_estimate_calibration`` audits the Jaccard estimator.
    A bimodal histogram (near-dup mass at low Hamming, background
    mass near 16) confirms the 32-bit fingerprint separates the
    corpus; a flat one says the threshold is a coin flip.

    Scale: candidate-bounded (the 4×8-bit band join), then a ≤33-row
    aggregate."""
    from finance_etl_pipeline_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    # pinned + band-ownership candidates, exactly as
    # dd_simhash_neardup: no DISTINCT re-shuffle, no join-back — the
    # histogram aggregates the carried fingerprints directly
    sim = D.simhash_table(docs).localCheckpoint(eager=True)
    dist = D.simhash_candidate_pairs(sim).select(
        F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
        .cast("int")
        .alias("hamming")
    )
    hist = dist.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))
    w = Window.orderBy("hamming").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "hamming",
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("cum_pairs"),
    ).orderBy("hamming")


@register(
    "dd_top_boilerplate_spans",
    f"""
    WITH tokd AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id,
             array_to_string(t[i:i + {SPAN_W - 1}], ' ') AS w
      FROM tokd, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - {SPAN_W - 1}, 0))) AS i
      )
    ),
    agg AS (
      SELECT w, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
      FROM win GROUP BY w
    ),
    ranked AS (
      SELECT w, n_docs, n_occurrences,
             row_number() OVER (ORDER BY n_docs DESC, w) AS rk
      FROM agg WHERE n_docs >= 2
    )
    SELECT rk, w AS span_text, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM ranked WHERE rk <= 20 ORDER BY rk
    """,
    "llm",
    "dedup",
    "spans",
)
def dd_top_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INTERPRETABLE face of repeated-span dedup: the top-20
    8-token spans by cross-document spread, with their text — the
    report a curation owner reads to decide whether repeated content
    is licence boilerplate (strip it), quotation (keep it), or true
    duplication (dedup it).  ``dd_repeated_spans`` quantifies the
    damage per document; this names the culprits.

    Scale: same narrow window map; the aggregate keys on the window
    string (high cardinality, map-side combined) and only spans seen
    in ≥ 2 docs reach the top-k rank (TakeOrdered-sized)."""
    docs = spread(table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", tokens_expr().alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.size(t) - (SPAN_W - 1))
    windows = F.when(
        F.size(t) >= SPAN_W,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, SPAN_W))),
    ).otherwise(F.array().cast("array<string>"))
    win = base.select("doc_id", F.explode(windows).alias("w"))
    agg = win.groupBy("w").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    rk = F.row_number().over(Window.orderBy(F.desc("n_docs"), "w"))
    return (
        agg.filter(F.col("n_docs") >= 2)
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 20)
        .select(
            "rk",
            F.col("w").alias("span_text"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
        .orderBy("rk")
    )


def _keeper_policy_sql() -> str:
    from finance_etl_pipeline_spark.plans import REGISTRY

    clusters = REGISTRY["dd_dedup_clusters"].oracle
    return f"""
    WITH c AS (SELECT doc_id, cluster_id FROM ({clusters})),
    ranked AS (
      SELECT c.doc_id, c.cluster_id, d.source,
             row_number() OVER (
               PARTITION BY c.cluster_id
               ORDER BY CASE WHEN d.source = 'src0' THEN 0 ELSE 1 END,
                        d.n_chars DESC, c.doc_id
             ) AS rk
      FROM c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id, source,
           CAST(rk = 1 AS INTEGER) AS is_keeper
    FROM ranked ORDER BY cluster_id, doc_id
    """


@register(
    "dd_keeper_policy",
    _keeper_policy_sql(),
    "llm",
    "dedup",
)
def dd_keeper_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven dedup survivorship: within each near-dup cluster
    keep the best document by an explicit priority (trusted source
    'src0' first, then longest, then lowest id) — the production
    alternative to dd_dedup_clusters' min-id keeper, which is
    deterministic but content-blind.  The policy is ONE window
    ordering, so swapping business rules never touches the clustering.

    Scale: ranks run per cluster_id over only the clustered docs —
    duplication-density-bounded, not corpus-bounded."""
    from finance_etl_pipeline_spark.plans import REGISTRY

    labels = REGISTRY["dd_dedup_clusters"].fn(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    j = labels.join(docs, "doc_id")
    rk = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(
            F.when(F.col("source") == "src0", 0).otherwise(1),
            F.desc("n_chars"),
            "doc_id",
        )
    )
    return (
        j.withColumn("rk", rk)
        .select(
            "doc_id",
            "cluster_id",
            "source",
            (F.col("rk") == 1).cast("int").alias("is_keeper"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def _lsh_sweep_sql() -> str:
    from finance_etl_pipeline_spark.operators import dedup as D

    _P = D.MERSENNE_P
    sh = """SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(t)-2, 0)),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
       FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
             FROM documents)"""
    branches = []
    for rows in (2, 4, 8):
        branches.append(f"""
    SELECT {rows} AS rows_per_band,
           {D.NUM_HASHES // rows} AS n_bands,
           count(*) AS n_candidate_pairs
    FROM (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (SELECT doc_id, i // {rows} AS band,
                   md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS sig
            FROM mh GROUP BY doc_id, band) a
      JOIN (SELECT doc_id, i // {rows} AS band,
                   md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS sig
            FROM mh GROUP BY doc_id, band) b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )""")
    return f"""
    WITH sh AS ({sh}),
    hashes AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {_P} AS hmod
      FROM sh
    ),
    mh AS MATERIALIZED (
      SELECT doc_id, i,
             min(({D.hash_a('i')} * hmod + {D.hash_b('i')}) % {_P}) AS mh
      FROM hashes, range(0, {D.NUM_HASHES}) t(i)
      GROUP BY doc_id, i
    )
    {' UNION ALL '.join(branches)}
    ORDER BY rows_per_band
    """


@register(
    "dd_lsh_band_sweep",
    _lsh_sweep_sql(),
    "llm",
    "dedup",
    "eval",
)
def dd_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH parameter sweep over the SAME 16 minhash values: candidate
    pair volume at 2/4/8 rows per band (8/4/2 bands) — the measured
    S-curve trade: fewer rows per band ⇒ more bands ⇒ higher recall
    AND more candidates to verify.  Run once per new corpus, this
    picks the operating point before committing dd_minhash_lsh_pairs'
    configuration (its 4×4 default sits in this sweep).

    Scale: the signature table is computed ONCE (16 ints per doc,
    localCheckpointed) and re-banded three ways; each band join is
    the usual bucket join, candidates ∝ dup density per config."""
    from finance_etl_pipeline_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    sh_hashed = D.hashed_shingle_rows(docs).localCheckpoint(eager=True)
    mh_wide = D.minhash_signatures_hashed(sh_hashed)
    # long form (doc_id, i, mh) for re-banding
    mh = mh_wide.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), F.col(f"mh{i}").alias("mh")
                    )
                    for i in range(D.NUM_HASHES)
                ]
            )
        ).alias("x"),
    ).select("doc_id", "x.i", "x.mh").localCheckpoint(eager=True)
    out = None
    for rows in (2, 4, 8):
        bands = (
            mh.withColumn("band", F.floor(F.col("i") / rows))
            .groupBy("doc_id", "band")
            .agg(
                F.md5(
                    F.concat_ws(
                        ",", F.array_sort(
                            F.collect_list(F.struct("i", "mh"))
                        ).getField("mh").cast("array<string>")
                    )
                ).alias("sig")
            )
        )
        a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
        cand = (
            a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        row = cand.agg(F.count(F.lit(1)).alias("n_candidate_pairs")).select(
            F.lit(rows).alias("rows_per_band"),
            F.lit(D.NUM_HASHES // rows).alias("n_bands"),
            "n_candidate_pairs",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rows_per_band")


@register(
    "dd_cross_source_spans",
    f"""
    WITH tokd AS (
      SELECT d.doc_id, d.source, string_split_regex(lower(d.text), '\\s+') AS t
      FROM documents d
    ),
    win AS (
      SELECT doc_id, source,
             {sql_hash60(f"array_to_string(t[i:i + {SPAN_W - 1}], ' ')")} AS h
      FROM tokd, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - {SPAN_W - 1}, 0))) AS i
      )
    ),
    leaked AS (
      SELECT h FROM (
        SELECT h, count(DISTINCT source) AS ns FROM win GROUP BY h
      ) WHERE ns >= 2
    ),
    tagged AS (
      SELECT DISTINCT w.source, w.h FROM win w JOIN leaked USING (h)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_leaked_spans
    FROM tagged GROUP BY source ORDER BY source
    """,
    "llm",
    "dedup",
    "spans",
)
def dd_cross_source_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE span leakage: 8-token spans appearing in ≥ 2
    distinct sources, counted per source — the contamination-shaped
    view of repeated content (a span shared across crawls/feeds is
    syndicated or boilerplate, and a train/eval split along source
    lines silently leaks it; cf. tx_decontaminate, which checks
    explicit eval n-grams).  ``dd_repeated_spans`` asks "how much of
    each DOC is repeated"; this asks "which SOURCES share verbatim
    content".

    Scale: the same token-window index, one groupBy on the window
    hash with a distinct-source count, and a semi join back —
    leakage-density-bounded after the index."""
    docs = spread(table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "source", tokens_expr().alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.size(t) - (SPAN_W - 1))
    windows = F.when(
        F.size(t) >= SPAN_W,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, SPAN_W))),
    ).otherwise(F.array().cast("array<string>"))
    win = base.select(
        "doc_id", "source", F.explode(windows).alias("w")
    ).select("doc_id", "source", hash60_expr(F.col("w")).alias("h"))
    leaked = (
        win.groupBy("h")
        .agg(F.countDistinct("source").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("h")
    )
    tagged = win.join(leaked, "h", "left_semi").select("source", "h").distinct()
    return (
        tagged.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked_spans"))
        .orderBy("source")
    )


# Winnowing guarantee window: every run of _WINNOW_W consecutive
# k-gram hashes contributes (at least) one selected fingerprint, so
# any match of length >= SPAN_W + _WINNOW_W - 1 tokens is guaranteed
# to share a fingerprint (Schleimer, Wilkerson & Aiken, SIGMOD 2003).
_WINNOW_W = 4


def _winnow_sql() -> str:
    """Fingerprint table: rightmost-min of each _WINNOW_W window."""
    return f"""
    {_windows_sql()},
    exp AS (
      SELECT doc_id, pos, h, pos + s AS t
      FROM win, LATERAL (
        SELECT unnest(generate_series(0, {_WINNOW_W - 1})) AS s
      )
    ),
    wmin AS (
      SELECT doc_id, t, pos, h,
             min(h) OVER (PARTITION BY doc_id, t) AS minh,
             count(*) OVER (PARTITION BY doc_id, t) AS n_in
      FROM exp
    ),
    sel AS (
      SELECT doc_id, t, max(pos) AS sel_pos, min(h) AS h
      FROM wmin WHERE h = minh AND n_in = {_WINNOW_W}
      GROUP BY doc_id, t
    ),
    fp AS (SELECT DISTINCT doc_id, sel_pos, h FROM sel)"""




def winnow_fp(docs):
    """(k-gram table, fingerprint table) for the winnowing family.

    ``win`` is the pinned (doc_id, pos, h) rolling-SPAN_W k-gram
    table; ``fp`` the selected (doc_id, sel_pos, h) fingerprints —
    rightmost-min of every _WINNOW_W window.  Shared by the
    registered query and the guarantee property test."""
    base = docs.select("doc_id", tokens_expr().alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.size(t) - (SPAN_W - 1))
    windows = F.when(
        F.size(t) >= SPAN_W,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, SPAN_W))),
    ).otherwise(F.array().cast("array<string>"))
    # inline explode (project-into-generator fusion — see
    # dd_repeated_spans); two consumers (kgram counts + winnow), so
    # pin the hashed k-gram table once like the other span queries.
    win = (
        base.select("doc_id", F.posexplode(windows).alias("p0", "w"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            hash60_expr(F.col("w")).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    exp = win.select(
        "doc_id",
        "pos",
        "h",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (_WINNOW_W - 1))
        ).alias("t"),
    )
    # rightmost-min per window as ONE hash aggregate: max_by over the
    # (-h, pos) struct picks the minimal hash, rightmost position —
    # identical selection to the min-over-window + filter + re-group
    # it replaces ((-h, pos) is unique within a window, so the argmax
    # is total).  The window form sorted every exploded row and
    # shipped them all to the exchange; the aggregate form combines
    # map-side (the ×_WINNOW_W explode collapses before the shuffle)
    # and never sorts (guide §2.3 "aggregate before you shuffle").
    # Measured at sf0.1: dd_winnow_fingerprints ~1.6 s → ~1.4 s
    # (noise-bounded); the plan loses both Window nodes and the
    # exploded rows collapse before the exchange.
    sel = (
        exp.groupBy("doc_id", "t")
        .agg(
            F.min("h").alias("h"),
            F.count(F.lit(1)).alias("n_in"),
            F.max_by(
                "pos", F.struct((-F.col("h")).alias("nh"), F.col("pos"))
            ).alias("sel_pos"),
        )
        .filter(F.col("n_in") == _WINNOW_W)
    )
    fp = sel.select("doc_id", "sel_pos", "h").distinct()
    return win, fp


@register(
    "dd_winnow_fingerprints",
    f"""
    WITH {_winnow_sql()},
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_fingerprints,
             CAST(sum(h % 1000000007) AS BIGINT) AS fp_checksum
      FROM fp GROUP BY doc_id
    ),
    kg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kgrams
      FROM win GROUP BY doc_id
    )
    SELECT k.doc_id, k.n_kgrams, p.n_fingerprints,
           {sql_igrid('p.n_fingerprints * 1.0 / k.n_kgrams', 6)}
             AS density_e6,
           p.fp_checksum
    FROM kg k JOIN per_doc p ON k.doc_id = p.doc_id
    ORDER BY k.doc_id
    """,
    "llm",
    "dedup",
    "bench",
)
def dd_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): from each document's rolling
    SPAN_W-token k-gram hashes, select the rightmost minimum of every
    _WINNOW_W-hash window.  The selected set is (a) position-stable
    local sampling — expected density 2/(w+1) — and (b) guaranteed to
    catch any copied passage of ≥ SPAN_W+_WINNOW_W−1 tokens, the
    property hash-mod sampling (``s_hash_sample``-style) cannot give.
    Emits per-doc k-gram count, fingerprint count, selection density,
    and a checksum over the selected (hash mod p) set that pins the
    exact selection cross-engine.

    Determinism: rightmost-min is decided by (h, pos) only; the hash
    is the shared md5→60-bit scheme, so both engines select the
    identical positions.

    Scale: the k-gram table explodes ×_WINNOW_W into selection
    windows and shuffles once on (doc_id, t) for the window min —
    narrow integer rows, no join-back (the argmin filter runs inside
    the same partition pass).  Fingerprints per doc are bounded by
    n_kgrams; everything downstream is per-doc aggregates.  The
    natural 100 TB consumer joins ``fp`` on h to find candidate pairs
    exactly like the LSH band join (candidates ∝ shared-content
    density, never n²)."""
    win, fp = winnow_fp(spread(table(spark, sf_dir, "documents")))
    per_doc = fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.sum(F.col("h") % 1000000007).cast("long").alias("fp_checksum"),
    )
    kg = win.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kgrams")
    )
    return (
        kg.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_kgrams",
            "n_fingerprints",
            igrid(
                F.col("n_fingerprints") / F.col("n_kgrams").cast("double"),
                6,
            ).alias("density_e6"),
            "fp_checksum",
        )
        .orderBy("doc_id")
    )
