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


def test_tfidf_df_join_broadcast(spark, sf_dir):
    plan = plan_of(spark, "tx_tfidf_top_terms", sf_dir)
    assert "BroadcastHashJoin" in plan  # vocabulary-side df table broadcast


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


def test_no_forced_broadcast_on_fact_proportional_sides():
    """customer-derived join sides must NOT carry a broadcast() hint:
    customer grows with SF, and a forced broadcast that is fine at
    sf0.1 OOMs executors at cluster scale.  AQE's size-based dynamic
    join selection broadcasts it while it is actually small (asserted
    in the executed-plan tests below)."""
    import inspect

    from finance_etl_pipeline_spark.plans import relational

    for fn in (
        relational.q3_top_unshipped_orders,
        relational.p_anti_join_integrity,
        relational.j_left_single_key,
    ):
        assert "F.broadcast" not in inspect.getsource(fn), fn.__name__


def test_q3_customer_join_broadcast_chosen_at_runtime(spark, sf_dir):
    plan = executed_plan_of(spark, "q3_top_unshipped_orders", sf_dir)
    assert "BroadcastHashJoin" in plan  # AQE picks broadcast at test SF


def test_anti_join_broadcast_chosen_at_runtime(spark, sf_dir):
    plan = executed_plan_of(spark, "p_anti_join_integrity", sf_dir)
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
