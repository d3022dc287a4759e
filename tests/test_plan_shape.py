"""Physical-plan regression tests: the optimizations SURVEY.md §4
promises must actually appear in the executed plan — filters reach the
parquet scan, small dims broadcast, aggregates run partial+final.
A refactor that silently turns a broadcast join into a sort-merge
shuffle or loses pushdown fails here, not in a 100 TB incident."""

from __future__ import annotations

import contextlib
import io

from finance_etl_pipeline_spark.plans import all_queries

QUERIES = all_queries()


def plan_of(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "HashAggregate" in plan  # partial+final pair
    assert plan.count("HashAggregate") >= 2


def test_q5_star_join_all_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q5_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact side must not shuffle for dims
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed into its scan


def test_projection_pruned_to_read_schema(spark, sf_dir):
    plan = plan_of(spark, "a_groupby_sum", sf_dir)
    # only the two needed columns reach the scan
    assert "ReadSchema: struct<l_extendedprice:double,l_returnflag:string>" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "a_topn_by_aggregate", sf_dir)
    assert "TakeOrderedAndProject" in plan  # not a global sort


def test_q8_dims_broadcast_type_filter_pushed(spark, sf_dir):
    plan = plan_of(spark, "q8_market_share", sf_dir)
    # part/supplier/nation×2/region all broadcast; orders+customer may shuffle
    assert plan.count("BroadcastHashJoin") >= 5
    assert "EqualTo(p_type,ECONOMY)" in plan  # dim filter reaches its scan
    assert "EqualTo(r_name,AMERICA)" in plan


def test_q21_single_lineitem_reaggregate_no_self_sortmerge(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must run as ONE per-order aggregate
    joined back — not two sort-merge self-joins of lineitem."""
    plan = plan_of(spark, "q21_waiting_suppliers", sf_dir)
    assert plan.count("SortMergeJoin") <= 2  # l1×orders and l1×per_order
    assert "BroadcastHashJoin" in plan  # supplier/nation/region stay broadcast


def test_tfidf_no_vocab_join_df_is_window(spark, sf_dir):
    """df must come from a window over the tf table (co-partitioned by
    term), NOT from joining a materialized vocabulary table: the vocab
    grows with the corpus (Heaps' law) so any vocab-side broadcast or
    equi-join is unbounded at web scale (round-2 verdict item 3)."""
    plan = plan_of(spark, "tx_tfidf_top_terms", sf_dir)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") >= 1
    # the only join left is the 1-row doc-count cross join
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # tree+detail lines


def test_minhash_verify_stays_broadcast_no_cartesian(spark, sf_dir):
    """Candidate verification must be broadcast array math: the only
    non-broadcast exchanges allowed are the signature groupBy, the
    band self-join, and the collect_list fold — never a cartesian or
    a shuffled pair join of the shingle index with itself."""
    plan = plan_of(spark, "dd_minhash_lsh_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # verify-side joins (cand_docs semi, pairs x2) are all broadcast
    assert plan.count("BroadcastHashJoin") >= 3


def test_centroid_classify_broadcasts_centroids(spark, sf_dir):
    plan = plan_of(spark, "emb_centroid_classify", sf_dir)
    assert "BroadcastHashJoin" in plan  # 640-row centroid table broadcast
    assert "CartesianProduct" not in plan


def test_bigram_perplexity_aggregates_partial_and_eval_no_shuffle_join(
    spark, sf_dir
):
    plan = plan_of(spark, "tx_bigram_perplexity", sf_dir)
    # training counts must be partial+final (map-side combined)
    assert plan.count("HashAggregate") >= 4
    # at test SF the count tables broadcast: the eval side never
    # shuffles for the scoring joins
    assert "BroadcastHashJoin" in plan
    # the only nested-loop is the 1-row vocab cross join (formatted
    # explain prints each node twice: tree line + detail section)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in plan


def test_key_skew_profiler_counts_are_partial(spark, sf_dir):
    plan = plan_of(spark, "prof_key_skew", sf_dir)
    # per-key counts map-side combine before the shuffle
    assert "partial_count" in plan
    # rank windows run on the reduced count table, not the raw scan
    assert "Window" in plan


def test_ngram_diversity_reads_only_needed_columns(spark, sf_dir):
    plan = plan_of(spark, "tx_ngram_diversity", sf_dir)
    assert "ReadSchema: struct<text:string,source:string>" in plan or (
        "ReadSchema: struct<source:string,text:string>" in plan
    )


def executed_plan_of(spark, name: str, sf_dir: str) -> str:
    """Plan AFTER an action: explain() on an executed DataFrame shows
    the AQE-final plan (isFinalPlan=true), i.e. the join strategy the
    runtime actually chose — not the static estimate."""
    df = QUERIES[name].fn(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


"""Package-wide forced-broadcast guard (round-2 verdict item 1).

A ``broadcast()`` hint on a frame that grows with scale factor
(customer 150k×SF, part 200k×SF, supplier 10k×SF, orders/lineitem,
documents/events/embeddings, unrestricted vocabularies or signature
tables) is fine at sf0.1 and OOMs executors at 100 TB — AQE's
size-based dynamic join selection already broadcasts such sides while
they are actually small (asserted in the executed-plan tests below),
so the hint buys nothing and costs an incident.  Round 1 fixed three
named sites and round 2 found the class had survived elsewhere; this
guard scans EVERY ``F.broadcast(...)`` call in plans/ and operators/
and requires each site to be explicitly adjudicated as bounded."""

GROWING_TABLES = (
    "customer",
    "orders",
    "part",
    "supplier",
    "lineitem",
    "documents",
    "events",
    "embeddings",
)

# (module-relative path, enclosing function, broadcast argument source)
# -> why the broadcast side is bounded (does NOT grow with SF).
ALLOWED_BROADCASTS = {
    ("plans/behavior.py", "emb_centroid_classify", "cells"): "per-label centroid table: |labels| x dim",
    ("plans/complex_shapes.py", "a_grouping_sets_revenue", "n"): "nation: 25 rows, SF-invariant",
    ("plans/complex_shapes.py", "a_grouping_sets_revenue", "r"): "region: 5 rows, SF-invariant",
    ("plans/curation.py", "hh_top_tokens", "total"): "1-row global aggregate",
    ("plans/curation.py", "drift_psi_events", "tot"): "per-window totals: 2 rows",
    ("plans/curation.py", "drift_ks_value", "tot"): "1-row cohort totals",
    ("plans/curation.py", "drift_ks_value", "prefix"): "per-band prefix offsets: _KS_BANDS rows",
    ("plans/curation.py", "drift_ks_value", "b"): "1-row aggregate of _KS_BANDS-1 exact percentile band boundaries",
    ("plans/curation.py", "tx_decontaminate_bloom", "bitmap"): "bloom bit array: ≤ M/64 = 2^16 words, constant by construction",
    ("plans/curation.py", "s_mixture_resample", "tot"): "1-row total",
    ("plans/curation.py", "s_mixture_resample", "tgt"): "per-source targets: |sources| rows",
    ("plans/curation.py", "prof_doclen_histogram", "tot"): "1-row total",
    ("plans/curation.py", "s_stride_interleave", "w"): "per-source weights: |sources| rows",
    ("plans/curation.py", "s_stride_interleave", "sw"): "1-row weight sum",
    ("plans/curation.py", "drift_psi_quantile", "breaks"): "quantile break grid: fixed bin count",
    ("plans/curation.py", "drift_psi_quantile", "tot"): "per-window totals",
    ("plans/curation.py", "tx_padding_efficiency", "stats"): "1-row max-length aggregate",
    ("plans/diversity.py", "tx_pmi_collocations", "tot"): "1-row totals",
    ("plans/diversity.py", "tx_pmi_collocations", "bt"): "per-token counts restricted to top bigram terms",
    ("plans/diversity.py", "tx_vocab_coverage", "vocab"): "limit(1000) frozen vocabulary",
    ("plans/events.py", "e_props_schema_profile", "tot"): "1-row total",
    ("plans/events.py", "e_user_ltv_decay", "anchor"): "1-row max-ts anchor",
    ("plans/events.py", "e_user_lifecycle", "maxw"): "1-row max week",
    ("plans/events.py", "e_markov_prediction_accuracy", "pred"): "argmax per event type: |event types| rows",
    ("plans/events.py", "e_changepoint_cusum", "stats"): "1-row mean/std",
    ("plans/events.py", "e_changepoint_cusum", "mx"): "1-row max",
    ("plans/events.py", "e_cohort_ltv_curve", "sizes"): "per-cohort-week sizes: |calendar weeks| rows",
    ("plans/importance.py", "s_dsir_importance", "ratio"): "per-hash-bucket ratios: fixed bucket count",
    ("plans/sampling.py", "s_per_source_cap", 'bands.select("source", "band", "cum_before")'): "band offset table: |sources| x 256 rows",
    ("plans/quality.py", "dq_sequence_gaps", "gap_agg"): "1-row global gap aggregate",
    ("plans/bi_shapes.py", "bi_rfm_migration", "mm"): "1-row min/max month aggregate",
    ("plans/skew_shapes.py", "prof_value_boxplot", "fences"): "per-event-type fence table: |event types| rows",
    ("plans/importance.py", "emb_retrieval_mrr", 'top.join(F.broadcast(qlab), "query_id")'): "per-query top-k: query_set(QUERY_CAP) x k rows",
    ("plans/importance.py", "emb_retrieval_mrr", "qlab"): "query labels: bounded by query_set(QUERY_CAP)",
    ("plans/importance.py", "emb_retrieval_ndcg", 'top.join(F.broadcast(qlab), "query_id")'): "per-query top-k: query_set(QUERY_CAP) x k rows",
    ("plans/importance.py", "emb_retrieval_ndcg", "qlab"): "query labels: bounded by query_set(QUERY_CAP)",
    ("plans/importance.py", "emb_retrieval_ndcg", "lbl"): "label-frequency aggregate: |label domain| rows",
    ("operators/ann_index.py", "_assign_cells", "cents"): "centroids: n_cells x dim by construction",
    ("operators/ann_index.py", "_assign_home_cells", "cents"): "centroids: n_cells x dim by construction (fused top-1 twin of _assign_cells)",
    ("operators/ann_index.py", "ivf_search", 'q.join(qcells, "query_id")'): "query vector set — bounded by the capped query-set contract, joined to probe cells",
    ("plans/ivf.py", "ann_ivf_topk", "cents"): "k-means centroids: k x dim",
    ("plans/ivf.py", "ann_ivf_topk", 'q.join(qcells, "query_id")'): "query vector set — bounded by query_set(QUERY_CAP) in code, joined to probe cells",
    ("plans/ivf.py", "ann_ivf_probe_sweep", "cents"): "centroids: k x dim",
    ("plans/ivf.py", "ann_ivf_probe_sweep", "levels"): "3-row nprobe level list",
    ("plans/ivf.py", "ann_ivf_probe_sweep", 'q.join(qcells, "query_id")'): "query vector set — bounded by query_set(QUERY_CAP) in code, joined to probe cells x levels",
    ("plans/ivf.py", "ann_ivf_probe_sweep", "q"): "query vector set — bounded by query_set(QUERY_CAP) in code",
    ("plans/ivf.py", "ann_ivf_probe_sweep", "nq"): "1-row query count",
    ("plans/ivf.py", "ann_ivf_probe_sweep", "hits"): "per-level hit counts: |levels| rows",
    ("plans/ivf.py", "ann_ivf_probe_sweep", "scanned"): "per-level scan totals: |levels| rows",
    ("plans/llm.py", "ann_cosine_topk_arrow", "q"): "query vector set — bounded by query_set(QUERY_CAP) in code",
    ("plans/lm.py", "tx_bigram_perplexity", "vocab"): "1-row distinct-count aggregate",
    ("plans/market.py", "bi_basket_lift", "ba"): "per-brand totals: |brands| rows",
    ("plans/market.py", "bi_basket_lift", "bb"): "per-brand totals: |brands| rows",
    ("plans/market.py", "bi_basket_lift", "n"): "1-row order count",
    ("plans/market.py", "graph_bfs_hops", "min_brand"): "1-row min",
    ("plans/market.py", "bi_lorenz_revenue_deciles", "tot"): "1-row total",
    ("plans/pq.py", "ann_pq_rerank_topk", "q"): "query vector set — bounded by query_set(QUERY_CAP) in code",
    ("plans/quantized.py", "ann_int8_topk", "q"): "query vector set — bounded by query_set(QUERY_CAP) in code",
    ("plans/relational.py", "q5_region_revenue", "n"): "nation: 25 rows",
    ("plans/relational.py", "q5_region_revenue", "r"): "region: 5 rows",
    ("plans/relational.py", "q10_returned_items", "n"): "nation: 25 rows",
    ("plans/relational.py", "j_left_composite_key", "rate"): "FX rate table: |currencies x months| rows",
    ("plans/relational.py", "j_surrogate_key_lookup", "r"): "region: 5 rows",
    ("plans/relational.py", "j_band_join_pricing", "bands"): "literal band grid",
    ("plans/robust.py", "f_winsorize_caps", "caps"): "per-event-type caps: |event types| rows",
    ("plans/skew_shapes.py", "prof_range_partition_plan", "b"): "1-row aggregate of 7 exact percentile boundaries",
    ("plans/sampling.py", "s_size_balanced_shards", "b"): "1-row aggregate of 7 percentile band boundaries",
    ("plans/robust.py", "f_mad_outliers", "med"): "per-event-type medians",
    ("plans/robust.py", "f_mad_outliers", "mad"): "per-event-type MADs",
    ("plans/robust.py", "dq_benford_first_digit", "tot"): "1-row total",
    ("plans/robust.py", "dq_chi2_independence", "rt"): "per-event-type totals",
    ("plans/robust.py", "dq_chi2_independence", "ct"): "per-band totals",
    ("plans/robust.py", "dq_chi2_independence", "g"): "1-row grand total",
    ("plans/sampling.py", "s_temperature_mixture", "tot"): "1-row total",
    ("plans/sampling.py", "s_epoch_plan", "tot"): "1-row normalizer",
    ("plans/spans.py", "dd_minhash_estimate_calibration", "cand_docs"): "candidate doc ids: ∝ dup density",
    ("plans/spans.py", "dd_minhash_estimate_calibration", "ma"): "candidate-restricted signatures",
    ("plans/spans.py", "dd_minhash_estimate_calibration", "mb"): "candidate-restricted signatures",
    ("plans/supplier_shapes.py", "q7_nation_volume", "sn"): "nation: 25 rows",
    ("plans/supplier_shapes.py", "q7_nation_volume", "cn"): "nation: 25 rows",
    ("plans/supplier_shapes.py", "q11_supplier_share", "n"): "nation: 25 rows",
    ("plans/text_rank.py", "tx_tfidf_top_terms", "n"): "1-row doc count",
    ("plans/text_rank.py", "tx_bm25_search", "qterms"): "fixed 3-term query list",
    ("plans/text_rank.py", "tx_bm25_search", "df"): "df restricted to query terms: 3 rows",
    ("plans/text_rank.py", "tx_bm25_search", "stats"): "1-row avgdl/n_docs",
    ("plans/text_rank.py", "tx_hybrid_search_rrf", "qterms"): "fixed 3-term query list",
    ("plans/text_rank.py", "tx_hybrid_search_rrf", "df"): "df restricted to query terms: 3 rows",
    ("plans/text_rank.py", "tx_hybrid_search_rrf", "stats"): "1-row avgdl/n_docs",
    ("plans/text_rank.py", "tx_hybrid_search_rrf", "qv"): "1-row query vector",
    ("plans/tpch_rest.py", "_asia_supplier_lineitem", "n"): "nation: 25 rows",
    ("plans/tpch_rest.py", "_asia_supplier_lineitem", "r"): "region: 5 rows",
    ("plans/tpch_rest.py", "q8_market_share", "n1"): "nation: 25 rows",
    ("plans/tpch_rest.py", "q8_market_share", "r"): "region: 5 rows",
    ("plans/tpch_rest.py", "q8_market_share", "n2"): "nation: 25 rows",
    ("plans/tpch_rest.py", "q9_product_profit", "n"): "nation: 25 rows",
    ("plans/tpch_rest.py", "q20_excess_suppliers", "n"): "nation: 25 rows",
    ("plans/tpch_rest.py", "q20_excess_suppliers", "r"): "region: 5 rows",
    ("plans/tpch_rest.py", "q21_waiting_suppliers", "n"): "nation: 25 rows",
    ("plans/tpch_rest.py", "q21_waiting_suppliers", "r"): "region: 5 rows",
    ("operators/bpe.py", "train_bpe", 'best.select(\n                            F.col("left").alias("__l"),\n                            F.col("right").alias("__r"),\n                        )'): "k best merge pairs per round: bounded by merge batch",
    ("operators/curate_pipeline.py", "gopher_pass", "bad"): "failed-doc ids: ∝ reject density of the batch",
    ("operators/diff.py", "restrict", "bad"): "differing-bucket id set: <= n_buckets rows by construction",
    ("operators/curate_pipeline.py", "neardup_keepers", "losers"): "near-dup loser ids: ∝ dup density",
    ("operators/curate_pipeline.py", "schedule_sequences", "w"): "per-source weights",
    ("operators/curate_pipeline.py", "schedule_sequences", "sw"): "1-row weight sum",
    ("operators/dedup.py", "jaccard_verify_hashed", "cand_docs"): "candidate doc ids: ∝ dup density",
    ("operators/dedup.py", "jaccard_verify_hashed", "candidates"): "candidate pairs: ∝ dup density",
    ("operators/dedup.py", "jaccard_verify_hashed", "with_a"): "candidate pairs + per-pair A-side sizes",
    ("operators/dedup.py", "jaccard_pairs", "cand_docs"): "candidate doc ids",
    ("operators/dedup.py", "jaccard_pairs", "candidates"): "candidate pairs",
    ("operators/graph.py", "hits_bipartite", "a_tot"): "1-row norm",
    ("operators/graph.py", "hits_bipartite", "h_tot"): "1-row norm",
    ("operators/pca.py", "project", "comp"): "PCA components: d x k",
    ("operators/pq.py", "adc_topk", "q"): "query vector set — bounded by query_set(QUERY_CAP) in code",
    ("operators/similarity.py", "cosine_topk", "q"): "query vector set — bounded by query_set(QUERY_CAP) in code",
    ("operators/zorder.py", "zorder_by", "stats"): "1-row min/max stats",
    ("operators/sketch.py", "categorical_profile_sketch", "top"): "1-row max of the merged MG summary",
    # package-root modules (scanned since round 7 — the guard is now
    # literally package-wide)
    ("dashboard.py", "revenue_trend", 'top_entities.select("entity")'): "top-8 entities by revenue: limit(8) upstream",
    ("dashboard.py", "top_expense_accounts", 'dim_accounts.select("account_code", "account_name", "account_type")'): "chart of accounts: |accounts| rows, SF-invariant reference data",
    ("star.py", "fact_gl", 'd_entity.select("entity", "entity_key")'): "entity dimension: |entities| rows, bounded org structure",
    ("star.py", "fact_gl", 'd_account.select("account_code", "account_key")'): "account dimension: |accounts| rows",
    ("star.py", "fact_kpi_monthly", 'd_entity.select("entity", "entity_key")'): "entity dimension: |entities| rows",
    ("transform.py", "add_fx_amount_base", "fx"): "FX rates: |currencies x days| rows, calendar-bounded",
    ("transform.py", "kpi_monthly", 'dim_accounts.select("account_code", "account_type")'): "chart of accounts: |accounts| rows",
    ("transform.py", "kpi_cube", 'dim_accounts.select("account_code", "account_type")'): "chart of accounts: |accounts| rows",
}


def _broadcast_sites():
    """Every F.broadcast(...) call site in the WHOLE package — plans/,
    operators/, sources/, streaming/, functions/, and the package-root
    modules (transform.py, star.py, dashboard.py, ...) — as (relpath,
    enclosing function, argument source, assignment sources for
    simple-Name arguments).  Round 6 scanned only plans/ + operators/,
    leaving 8 root-module hints unadjudicated; the scan is now
    literally package-wide."""
    import ast
    import os

    import finance_etl_pipeline_spark as pkg

    root = os.path.dirname(pkg.__file__)
    out = []
    subs = [""] + sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("__")
    )
    for sub in subs:
        subdir = os.path.join(root, sub) if sub else root
        for fname in sorted(os.listdir(subdir)):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(subdir, fname)
            src = open(path).read()
            tree = ast.parse(src)
            stack = []

            class V(ast.NodeVisitor):
                def visit_FunctionDef(self, node):
                    stack.append(node)
                    self.generic_visit(node)
                    stack.pop()

                def visit_Call(self, node):
                    f = node.func
                    if (
                        isinstance(f, ast.Attribute)
                        and f.attr == "broadcast"
                        and isinstance(f.value, ast.Name)
                        and f.value.id == "F"
                    ):
                        arg = node.args[0]
                        arg_src = ast.get_source_segment(src, arg)
                        assigns = []
                        if isinstance(arg, ast.Name) and stack:
                            for stmt in ast.walk(stack[-1]):
                                if isinstance(stmt, ast.Assign) and any(
                                    isinstance(t, ast.Name) and t.id == arg.id
                                    for t in stmt.targets
                                ):
                                    assigns.append(
                                        ast.get_source_segment(src, stmt.value)
                                    )
                        out.append(
                            (
                                f"{sub}/{fname}" if sub else fname,
                                stack[-1].name if stack else "<module>",
                                arg_src,
                                assigns,
                            )
                        )
                    self.generic_visit(node)

            V().visit(tree)
    return out


def test_every_broadcast_site_is_adjudicated_bounded():
    """Any NEW F.broadcast(...) anywhere in plans/ or operators/ fails
    here until it is added to ALLOWED_BROADCASTS with a boundedness
    justification — the hint is only legitimate on frames whose size
    does not grow with scale factor."""
    sites = _broadcast_sites()
    assert sites, "AST scan found no broadcast sites — scanner broken?"
    unknown = [
        (mod, fn, arg)
        for mod, fn, arg, _ in sites
        if (mod, fn, arg) not in ALLOWED_BROADCASTS
    ]
    assert not unknown, (
        "unadjudicated F.broadcast() hint(s) — either remove the hint "
        "(AQE broadcasts small sides automatically) or add the site to "
        f"ALLOWED_BROADCASTS with a boundedness reason: {unknown}"
    )


def test_no_broadcast_assigned_directly_from_growing_table():
    """Lineage layer: even an allowlisted name must not be a direct
    (non-aggregated, non-limited, non-semi-restricted) read of an
    SF-growing table — catches an allowlist entry that rots when the
    assignment changes underneath it."""
    import re

    growing_read = re.compile(
        r'table\(\s*spark,\s*sf_dir,\s*"(%s)"\s*\)' % "|".join(GROWING_TABLES)
    )
    bounding = re.compile(r"\.agg\(|\.limit\(|left_semi|\.head\(")
    offenders = []
    for mod, fn, arg, assigns in _broadcast_sites():
        for a in assigns:
            if a and growing_read.search(a) and not bounding.search(a):
                offenders.append((mod, fn, arg, a))
    assert not offenders, (
        "broadcast of a frame read directly from an SF-growing table "
        f"without aggregation/limit/semi-restriction: {offenders}"
    )


def test_q3_customer_join_broadcast_chosen_at_runtime(spark, sf_dir):
    plan = executed_plan_of(spark, "q3_top_unshipped_orders", sf_dir)
    assert "BroadcastHashJoin" in plan  # AQE picks broadcast at test SF


def test_anti_join_broadcast_chosen_at_runtime(spark, sf_dir):
    plan = executed_plan_of(spark, "p_anti_join_integrity", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_q2_part_supplier_broadcast_chosen_at_runtime(spark, sf_dir):
    """Hints removed (part/supplier grow with SF) — AQE must still
    pick broadcast joins for them at test SF, where they are small."""
    plan = executed_plan_of(spark, "q2_min_cost_supplier", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_q9_part_supplier_broadcast_chosen_at_runtime(spark, sf_dir):
    plan = executed_plan_of(spark, "q9_product_profit", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2  # part + supplier


def test_f_margin_pct_customer_broadcast_chosen_at_runtime(spark, sf_dir):
    plan = executed_plan_of(spark, "f_margin_pct", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_dsir_two_corpus_scans_and_broadcast_ratio(spark, sf_dir):
    """s_dsir_importance promises exactly two passes over documents
    (fused bucket stats + per-doc scoring) with the ratio table
    broadcast — a third scan means the totals branch regressed."""
    import re

    plan = plan_of(spark, "s_dsir_importance", sf_dir)
    # formatted mode prints each node twice (tree + details): count
    # unique numbered scan nodes
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "BroadcastHashJoin" in plan


def test_frame_sample_is_narrow(spark, sf_dir):
    """mm_frame_sample is explode-only: besides spread()'s round-robin
    scan-parallelism Exchange and the final presentation sort, nothing
    may shuffle — no aggregate/join Exchange can appear."""
    import re

    plan = plan_of(spark, "mm_frame_sample", sf_dir)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    assert "hashpartitioning" not in plan  # no agg/join shuffle


def test_incremental_neardup_filters_candidates_before_verify(spark, sf_dir):
    """dd_incremental_neardup must keep the Jaccard verification
    broadcast-shaped (candidates ∝ batch dup density) — a SortMergeJoin
    on the shingle index would mean verification regressed to
    corpus-proportional pairs."""
    plan = plan_of(spark, "dd_incremental_neardup", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_repeated_spans_no_cartesian_semi_join_back(spark, sf_dir):
    """dd_repeated_spans must restrict positions with a semi join on
    the duplicated-hash set — a CartesianProduct or a pairwise doc
    join would mean the span index regressed to all-pairs."""
    plan = plan_of(spark, "dd_repeated_spans", sf_dir)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_iterative_graph_joins_are_shuffled_hash(spark, sf_dir):
    """The round-5 iterative-join contract (SCALE.md): PageRank, BFS,
    and HITS join their small score/distance vector to a pinned edge
    table with a SHUFFLE_HASH hint so the edge side is streamed, not
    re-sorted per iteration.  A dropped hint silently regresses to
    sort-merge — every iteration then pays an O(|E| log |E|) sort —
    so assert the executed strategy, not the hint.  (Connected
    components checkpoints each round eagerly, so its per-round joins
    never appear in the final plan; its strategy is pinned by the
    same code path as these.)"""
    for name, min_shj in (
        ("graph_pagerank_copurchase", 1),  # last iteration post-checkpoint
        ("graph_bfs_hops", 3),  # all _BFS_HOPS hop joins visible
        ("graph_hits_authorities", 1),  # last round past the lazy pins
    ):
        plan = plan_of(spark, name, sf_dir)
        assert plan.count("ShuffledHashJoin") >= min_shj, name
        assert "SortMergeJoin" not in plan, name


def test_vocab_coverage_broadcasts_vocab(spark, sf_dir):
    """tx_vocab_coverage joins the 1000-row vocabulary back onto the
    corpus-sized token stream — that join must be broadcast so the
    token side never shuffles for it."""
    plan = plan_of(spark, "tx_vocab_coverage", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pii_scan_is_single_scan_narrow(spark, sf_dir):
    """tx_pii_scan is a per-row regex map + one per-source aggregate:
    exactly one documents scan, no join of any kind."""
    import re

    plan = plan_of(spark, "tx_pii_scan", sf_dir)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_cross_source_spans_semi_join_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "dd_cross_source_spans", sf_dir)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_lsh_band_sweep_single_signature_computation(spark, sf_dir):
    """The sweep re-bands ONE checkpointed signature table; a parquet
    re-scan per configuration would mean the reuse regressed."""
    import re

    plan = plan_of(spark, "dd_lsh_band_sweep", sf_dir)
    # after the two eager checkpoints the three branches read cached
    # scans — at most the original documents scan appears once
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 1


def test_concurrent_sessions_bucket_join_no_cartesian(spark, sf_dir):
    """The interval join must be an equi join on the hour bucket with
    the ownership filter — a CartesianProduct or non-equi-only join
    would mean the range join regressed to all-pairs sessions."""
    plan = plan_of(spark, "e_concurrent_sessions", sf_dir)
    assert "CartesianProduct" not in plan
    # the overlap predicate runs as a post-join Filter on candidates,
    # never as the join itself
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_clusters_no_cartesian(spark, sf_dir):
    """dd_dedup_clusters consumes the LSH pipeline.  Its final plan is
    checkpoint-truncated (connected_components pins each round), so the
    verify-join shape is asserted on dd_minhash_lsh_pairs above — here
    we pin what remains visible: no cartesian anywhere."""
    plan = plan_of(spark, "dd_dedup_clusters", sf_dir)
    assert "CartesianProduct" not in plan


def test_ivf_probe_sweep_single_corpus_pass(spark, sf_dir):
    """The sweep pins ONE assigned-corpus pass (eager checkpoint) and
    every arm — per-level candidates, query set, exact ground truth —
    reads the pinned table: at most the assignment build's two parquet
    scans (base + centroid subset) may appear; more means an arm
    regressed to re-scanning the corpus."""
    import re

    plan = plan_of(spark, "ann_ivf_probe_sweep", sf_dir)
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_size_balanced_shards_no_global_window(spark, sf_dir):
    """The shard ranker must window WITHIN size bands — a global
    row_number (empty partition spec) would funnel the corpus through
    one task.  'Window [...]' with no 'partitionBy' shows up in the
    formatted plan as a Window whose partition spec is empty; assert
    every Window node carries the band key instead."""
    plan = plan_of(spark, "s_size_balanced_shards", sf_dir)
    assert "CartesianProduct" not in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "band" in spec, f"global (unpartitioned) window: {spec}"


def test_salted_join_no_plain_key_join(spark, sf_dir):
    """j_salted_skew_join must join on (custkey, salt) — the whole
    point.  The physical join keys must include the salt column; a
    plain custkey-only join would mean the salting silently collapsed
    (e.g. a rewrite dropped __salt)."""
    plan = plan_of(spark, "j_salted_skew_join", sf_dir)
    assert "__salt" in plan
    assert "CartesianProduct" not in plan


def test_ewma_single_window_no_self_join(spark, sf_dir):
    """w_ewma_trailing's Spark form is ONE trailing window over the
    daily aggregate — the rank-band self-join lives only in the
    oracle.  Two scans of events (or any join) would mean the closed
    form regressed to the naive shape."""
    plan = plan_of(spark, "w_ewma_trailing", sf_dir)
    assert "Join" not in plan
    # formatted explain prints each node twice (tree + detail)
    assert plan.count("Scan parquet") <= 2


def test_upsert_anti_join_or_outer_shape(spark, sf_dir):
    """u_upsert_merge is one key join between target and compacted
    source — no cartesian, no repeated orders scans beyond the two
    snapshot carvings."""
    plan = plan_of(spark, "u_upsert_merge", sf_dir)
    assert "CartesianProduct" not in plan
    # two snapshot carvings, each printed twice (tree + detail)
    assert plan.count("Scan parquet") <= 4


def test_concurrent_sessions_join_width_is_pinned(spark, sf_dir):
    """Round-6 rule: row-exploding equi-joins pin their shuffle width
    with a NUMBERED repartition (AQE's input-sized coalescing ran the
    ~100x-exploding bucket join on 2 tasks — 2.67s vs 1.92s at sf0.1).
    The executed plan must carry REPARTITION_BY_NUM exchanges on the
    bucket key with exactly the session's shuffle-partition count, on
    BOTH join inputs."""
    from finance_etl_pipeline_spark.plans import all_queries

    df = all_queries()["e_concurrent_sessions"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = spark.conf.get("spark.sql.shuffle.partitions")
    pinned = [
        line
        for line in plan.split("\n")
        if "REPARTITION_BY_NUM" in line and f", {n})" in line
    ]
    assert len(pinned) >= 2, plan[:2000]
