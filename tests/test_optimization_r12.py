"""Focused regressions for the round-12 optimization rewrites: the
driver-local tiny-commit/read fast paths must be observationally
identical to the Spark paths they shortcut (same snapshot semantics,
same values, same stats-driven skipping), and must FALL BACK rather
than mis-handle snapshots that need the full machinery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import manifest as M


def test_commit_rows_equals_commit(spark, tmp_path):
    """commit_rows and commit publish interchangeable versions: same
    rows, same logical schema, same file-skipping behavior from the
    harvested stats, and they interleave on one table."""
    t = str(tmp_path / "tbl")
    rows1 = [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)]
    ddl = "id long, s string, x double"
    v1 = M.commit_rows(spark, rows1, ddl, t)
    assert v1 == 1
    # a Spark-path append on top of the pyarrow-written v1
    v2 = M.commit(spark.createDataFrame([(4, "d", 4.0)], ddl), t)
    assert v2 == 2
    # and a fast-path append on top of that
    v3 = M.commit_rows(spark, [(5, "e", 5.0)], ddl, t)
    assert v3 == 3
    got = M.read_version(spark, t)
    assert [f.simpleString() for f in got.schema.fields] == [
        "id:bigint",
        "s:string",
        "x:double",
    ]
    assert {
        (r["id"], r["s"], r["x"]) for r in got.collect()
    } == set(rows1) | {(4, "d", 4.0), (5, "e", 5.0)}
    # stats harvested from the pyarrow footer drive file skipping
    # exactly like Spark-written files: id==5 must prune v1's and
    # v2's files from the scan
    pruned = M.read_version(spark, t, where=[("id", "==", 5)])
    assert pruned.count() == 1
    files = {
        os.path.basename(r[0])
        for r in pruned.withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    }
    assert len(files) == 1


def test_commit_rows_array_column_and_overwrite(spark, tmp_path):
    t = str(tmp_path / "cent")
    rows = [(0, [1.0, 2.0], 2.23606797749979), (1, [0.0, 0.0], 0.0)]
    M.commit_rows(
        spark, rows, "cell_id long, cv array<double>, cn double", t,
        mode="overwrite",
    )
    M.commit_rows(
        spark, [(7, [9.0], 9.0)],
        "cell_id long, cv array<double>, cn double", t, mode="overwrite",
    )
    got = M.read_version(spark, t).collect()
    assert [(r["cell_id"], list(r["cv"]), r["cn"]) for r in got] == [
        (7, [9.0], 9.0)
    ]
    assert M.latest_version(t) == 2


def test_commit_rows_unsupported_type_falls_back(spark, tmp_path):
    """A schema outside the pyarrow mirror (decimal) must fall back to
    the Spark write path and still publish correctly."""
    from decimal import Decimal

    t = str(tmp_path / "dec")
    v = M.commit_rows(
        spark, [(1, Decimal("2.50"))], "id long, amt decimal(10,2)", t
    )
    assert v == 1
    r = M.read_version(spark, t).collect()[0]
    assert r["id"] == 1 and r["amt"] == Decimal("2.50")


def test_commit_rows_txn_idempotent(spark, tmp_path):
    t = str(tmp_path / "txn")
    v1 = M.commit_rows(spark, [(1,)], "x long", t, txn=("app", 1))
    v2 = M.commit_rows(spark, [(1,)], "x long", t, txn=("app", 1))
    assert (v1, v2) == (1, 1)  # replay is a no-op at the tip
    assert M.read_version(spark, t).count() == 1


def test_read_rows_local_equals_read_version(spark, tmp_path):
    t = str(tmp_path / "mix")
    M.commit_rows(spark, [(1, "a"), (2, "b")], "id long, s string", t)
    M.commit(spark.createDataFrame([(3, "c")], "id long, s string"), t)
    local = M.read_rows_local(t)
    via_spark = [r.asDict() for r in M.read_version(spark, t).collect()]
    assert sorted(local, key=lambda r: r["id"]) == sorted(
        via_spark, key=lambda r: r["id"]
    )
    df = M.read_version_local(spark, t)
    assert df.schema == M.read_version(spark, t).schema
    assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_read_rows_local_falls_back_on_tombstones_and_partitions(
    spark, tmp_path
):
    """Snapshots the local reader does not replicate must return None
    (caller falls back), never wrong rows."""
    t = str(tmp_path / "del")
    M.commit_rows(spark, [(1, 0), (2, 1)], "id long, k int", t)
    assert M.read_rows_local(t) is not None
    M.delete_where(t, [("id", "==", 1)])
    assert M.read_rows_local(t) is None  # merge-on-read tombstone
    p = str(tmp_path / "part")
    M.commit(
        spark.createDataFrame([(1, 0), (2, 1)], "id long, k int"),
        p,
        partition_by=["k"],
    )
    assert M.read_rows_local(p) is None  # hive partition layout
    assert M.read_rows_local(str(tmp_path / "nope")) is None  # no table


def test_read_rows_local_schema_evolution(spark, tmp_path):
    """An appended column surfaces as None for pre-evolution files —
    the unionByName(allowMissingColumns) semantics of the full path."""
    t = str(tmp_path / "evo")
    M.commit_rows(spark, [(1,)], "id long", t)
    M.commit_rows(spark, [(2, "b")], "id long, s string", t)
    local = sorted(M.read_rows_local(t), key=lambda r: r["id"])
    assert local == [{"id": 1, "s": None}, {"id": 2, "s": "b"}]


def _hard_triplets_window_reference(base):
    """The pre-round-12 window formulation of emb_hard_negatives'
    mining tail, kept verbatim as the equivalence reference for the
    packed-argmax aggregate that replaced it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from finance_etl_pipeline_spark.functions.scalars import igrid
    from finance_etl_pipeline_spark.operators.similarity import dot

    a = base.select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("actual"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("other"),
        F.col("label").alias("other_label"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos_e4 = igrid(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    pairs = a.join(b, F.col("anchor") != F.col("other")).select(
        "anchor", "actual", "other", "other_label", cos_e4.alias("cos_e4")
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("cos_e4"), "other")
    pos = (
        pairs.filter(F.col("other_label") == F.col("actual"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "anchor",
            F.col("other").alias("pos_id"),
            F.col("cos_e4").alias("pos_cos_e4"),
        )
    )
    neg = (
        pairs.filter(F.col("other_label") != F.col("actual"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "anchor",
            F.col("other").alias("neg_id"),
            F.col("cos_e4").alias("neg_cos_e4"),
        )
    )
    return (
        pos.join(neg, "anchor")
        .select(
            "anchor",
            "pos_id",
            "pos_cos_e4",
            "neg_id",
            "neg_cos_e4",
            (F.col("pos_cos_e4") - F.col("neg_cos_e4")).alias("margin_e4"),
        )
        .orderBy("anchor")
    )


def _base_from_rows(spark, rows):
    from pyspark.sql import functions as F

    from finance_etl_pipeline_spark.operators.similarity import (
        as_double,
        norm,
    )

    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    return df.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )


def test_hard_negatives_packed_equals_window_edge_corpus(spark):
    """The packed-argmax aggregate must be row-for-row equal to the
    window formulation on every edge the pack encoding has to get
    right: NULL cosines (zero-norm vectors) losing to any real cosine
    but winning when a side is all-NULL, cosine ties breaking to the
    smallest other id, NULL labels feeding neither side, and anchors
    missing a side dropping entirely."""
    from finance_etl_pipeline_spark.plans.emb_neardup import _hard_triplets

    rows = [
        (1, "A", [1.0, 0.0]),     # ties with 2 for others' rankings
        (2, "A", [1.0, 0.0]),
        (3, "A", [0.0, 0.0]),     # zero norm: NULL cosine vs everyone
        (4, "B", [0.0, 1.0]),
        (5, None, [1.0, 1.0]),    # NULL label: feeds neither side
        (6, "C", [1.0, 0.0]),     # no same-label other: no pos -> drops
        (7, "D", [0.0, 0.0]),     # 8's only pos candidate, NULL cosine
        (8, "D", [2.0, 0.0]),     # pos side all-NULL -> null fallback
    ]
    base = _base_from_rows(spark, rows)
    got = _hard_triplets(base).collect()
    want = _hard_triplets_window_reference(base).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    by_anchor = {r["anchor"]: r for r in got}
    # spot-pin the edges so the reference itself is sanity-checked
    assert 5 not in by_anchor and 6 not in by_anchor
    assert by_anchor[1]["pos_id"] == 2  # tie (cos 10000 vs 2 and... )
    r8 = by_anchor[8]
    assert r8["pos_id"] == 7 and r8["pos_cos_e4"] is None
    assert r8["margin_e4"] is None


def test_hard_negatives_packed_equals_window_real_table(spark, sf_dir):
    """Same pin on the real embeddings table at the test SF."""
    from pyspark.sql import functions as F

    from finance_etl_pipeline_spark.operators.similarity import (
        as_double,
        norm,
    )
    from finance_etl_pipeline_spark.plans.emb_neardup import _hard_triplets
    from finance_etl_pipeline_spark.sources.readers import spread, table

    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    got = _hard_triplets(base).collect()
    want = _hard_triplets_window_reference(base).collect()
    assert len(got) > 0
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def _adc_pairs_reference(base, books, dim, pred):
    """The pre-r12 per-pair ADC formulation: adc_distance recomputes
    every subspace distance for each (query, corpus) row."""
    from finance_etl_pipeline_spark.operators import pq as PQ
    from finance_etl_pipeline_spark.operators.kmeans import ROUND_N
    from finance_etl_pipeline_spark.operators.similarity import query_set
    from finance_etl_pipeline_spark.functions.scalars import fround

    codes = PQ.encode(base, dim, books)
    q = query_set(base, pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return (
        F.broadcast(q)
        .join(codes, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            fround(
                PQ.adc_distance(F.col("qv"), books, dim), ROUND_N
            ).alias("adist"),
        )
    )


def _adc_pairs_lut(base, books, dim, pred):
    """The shipped r12 formulation: per-query lookup tables, per-pair
    map probes (mirrors adc_topk's pair stage exactly)."""
    from finance_etl_pipeline_spark.operators import pq as PQ
    from finance_etl_pipeline_spark.operators.kmeans import ROUND_N
    from finance_etl_pipeline_spark.operators.similarity import query_set
    from finance_etl_pipeline_spark.functions.scalars import fround

    codes = PQ.encode(base, dim, books)
    q = query_set(base, pred).select(
        F.col("vec_id").alias("query_id"),
        *PQ.adc_lut(F.col("v"), books, dim),
    )
    terms = [
        F.element_at(F.col(f"lut{i}"), F.col(f"code{i}"))
        for i in range(len(books))
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return (
        F.broadcast(q)
        .join(codes, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", fround(total, ROUND_N).alias("adist")
        )
    )


def test_adc_lut_equals_per_pair_distance_real_table(spark, sf_dir):
    """Every (query, corpus) ADC distance from the r12 lookup-table
    pair stage is bit-equal to the per-pair adc_distance formulation
    it replaced — over the real embeddings table and real trained
    codebooks (dropped-cluster ids included if training drops any)."""
    from finance_etl_pipeline_spark.operators import pq as PQ
    from finance_etl_pipeline_spark.operators.similarity import as_double
    from finance_etl_pipeline_spark.sources.readers import table

    dim = 64
    base = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )
    books = PQ.train_codebooks(base, dim)
    pred = F.col("vec_id") % 50 == 0
    ref = {
        (r.query_id, r.vec_id): r.adist
        for r in _adc_pairs_reference(base, books, dim, pred).collect()
    }
    got = {
        (r.query_id, r.vec_id): r.adist
        for r in _adc_pairs_lut(base, books, dim, pred).collect()
    }
    base.unpersist()
    assert ref and got.keys() == ref.keys()
    assert got == ref  # exact float equality: same folds, same order


def test_adc_lut_handles_non_contiguous_code_ids(spark):
    """A codebook whose cluster ids are NOT contiguous (empty clusters
    drop out of Lloyd's) must probe correctly through the map-keyed
    LUT — the case an array-indexed table would get wrong."""
    from finance_etl_pipeline_spark.operators import pq as PQ

    rows = [
        (0, [0.0, 0.0, 4.0, 4.0]),
        (1, [1.0, 0.0, 0.0, 1.0]),
        (2, [9.0, 9.0, 9.0, 9.0]),
        (3, [0.5, 0.5, 3.5, 3.5]),
    ]
    base = spark.createDataFrame(rows, "vec_id long, v array<double>")
    # hand-built books with gaps in the id space (ids 0, 2, 5)
    books = [
        [(0, [0.0, 0.0]), (2, [1.0, 1.0]), (5, [9.0, 9.0])],
        [(0, [4.0, 4.0]), (2, [0.0, 1.0]), (5, [9.0, 9.0])],
    ]
    pred = F.col("vec_id") >= 0  # every row is a query
    ref = {
        (r.query_id, r.vec_id): r.adist
        for r in _adc_pairs_reference(base, books, 4, pred).collect()
    }
    got = {
        (r.query_id, r.vec_id): r.adist
        for r in _adc_pairs_lut(base, books, 4, pred).collect()
    }
    assert ref and got == ref


def test_hashed_jaccard_pairs_equal_string_formulation(spark, sf_dir):
    """The r12 hashed-key brute-force Jaccard (dd_ngram_jaccard_pairs'
    new shape) emits exactly the pairs and gridded values of the
    string-keyed formulation it replaced — hash injectivity holds on
    the real shingle set, so counts and denominators are identical."""
    from finance_etl_pipeline_spark.operators import dedup as D
    from finance_etl_pipeline_spark.sources.readers import table

    docs = table(spark, sf_dir, "documents")
    ref = {
        (r.doc_a, r.doc_b): r.jaccard_e4
        for r in D.jaccard_pairs(
            D.shingle_table(docs), None, 0.7
        ).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.jaccard_e4
        for r in D.jaccard_pairs(
            D.hashed_shingle_rows(docs), None, 0.7, key="h"
        ).collect()
    }
    assert got == ref and ref


def test_hashed_containment_equals_string_formulation(spark, sf_dir):
    """Same injectivity pin for the containment variant: intersection
    counts and per-doc sizes over hashed shingles match the string
    formulation pair-for-pair (both directions' grids)."""
    from finance_etl_pipeline_spark.operators import dedup as D
    from finance_etl_pipeline_spark.functions.scalars import igrid
    from finance_etl_pipeline_spark.sources.readers import table

    docs = table(spark, sf_dir, "documents")

    def containment(sh, key):
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a = sh.select(F.col("doc_id").alias("doc_a"), key)
        b = sh.select(F.col("doc_id").alias("doc_b"), key)
        inter = (
            a.join(b, [key])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        sa = sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("n").alias("na")
        )
        sb = sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")
        )
        return (
            inter.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                igrid(F.col("i").cast("double") / F.col("na"), 4).alias(
                    "ca"
                ),
                igrid(F.col("i").cast("double") / F.col("nb"), 4).alias(
                    "cb"
                ),
            )
        )

    ref = {
        (r.doc_a, r.doc_b): (r.ca, r.cb)
        for r in containment(D.shingle_table(docs), "s").collect()
    }
    got = {
        (r.doc_a, r.doc_b): (r.ca, r.cb)
        for r in containment(D.hashed_shingle_rows(docs), "h").collect()
    }
    assert got == ref and ref


def test_argmin_candidates_equals_unrolled_form(spark, sf_dir):
    """The r12 single-lambda candidate argmin (one literal array of
    (cv, cluster) structs + transform) assigns exactly like the
    per-candidate unrolled expression tree it replaced — same
    fround'd distances, same lowest-cluster tie-break — on the real
    corpus and on a crafted tie case."""
    from finance_etl_pipeline_spark.operators import kmeans as KM
    from finance_etl_pipeline_spark.functions.scalars import fround
    from finance_etl_pipeline_spark.operators.similarity import as_double
    from finance_etl_pipeline_spark.sources.readers import table

    def assign_unrolled(base, centroids):
        candidates = F.array(
            *[
                F.struct(
                    fround(
                        KM.sqdist_to(F.col("v"), vec), KM.ROUND_N
                    ).alias("dist"),
                    F.lit(cid).alias("cluster"),
                )
                for cid, vec in centroids
            ]
        )
        best = F.array_min(candidates)
        return base.select(
            "vec_id",
            best["cluster"].alias("cluster"),
            best["dist"].alias("dist"),
        )

    base = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )
    cents = KM.initial_centroids(base, 8)
    ref = {
        r.vec_id: (r.cluster, r.dist)
        for r in assign_unrolled(base, cents).collect()
    }
    got = {
        r.vec_id: (r.cluster, r.dist)
        for r in KM.assign_clusters(base, cents)
        .select("vec_id", "cluster", "dist")
        .collect()
    }
    base.unpersist()
    assert ref and got == ref

    # tie case: two identical centroids (non-contiguous ids) — the
    # argmin must break to the lower cluster id in both forms
    tie = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [5.0, 5.0])], "vec_id long, v array<double>"
    )
    tie_cents = [(2, [1.0, 1.0]), (5, [1.0, 1.0]), (7, [5.0, 5.0])]
    r1 = {
        r.vec_id: (r.cluster, r.dist)
        for r in assign_unrolled(tie, tie_cents).collect()
    }
    r2 = {
        r.vec_id: (r.cluster, r.dist)
        for r in KM.assign_clusters(tie, tie_cents)
        .select("vec_id", "cluster", "dist")
        .collect()
    }
    assert r1 == r2 and r1[0][0] == 2


def test_commit_decimal_column_harvest_survives(spark, tmp_path):
    """pyarrow's statistics cast raises lazily at .min/.max for
    DECIMAL columns Spark writes; the harvest must drop that column's
    stats (no skipping) and never fail the commit, and a predicate on
    the column must still answer correctly via the scan."""
    from decimal import Decimal

    t = str(tmp_path / "decfull")
    df = spark.createDataFrame(
        [(1, Decimal("2.50")), (2, Decimal("7.25"))],
        "id long, amt decimal(10,2)",
    )
    v = M.commit(df, t)
    assert v == 1
    got = M.read_version(spark, t)
    assert {(r["id"], r["amt"]) for r in got.collect()} == {
        (1, Decimal("2.50")),
        (2, Decimal("7.25")),
    }
    # id keeps harvested stats (skipping works); amt has none, so a
    # where on it must fall back to scanning, not mis-prune
    assert M.read_version(spark, t, where=[("id", "==", 2)]).count() == 1
    rows = M.read_version(
        spark, t, where=[("amt", ">", Decimal("3.00"))]
    ).collect()
    assert [(r["id"], r["amt"]) for r in rows] == [(2, Decimal("7.25"))]
