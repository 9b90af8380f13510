"""Plan-shape regression guard: the optimizer properties EXPLAIN.md
documents for flagship queries, asserted as tests so a plan
regression fails CI instead of silently changing a generated doc.

Assertions are deliberately coarse (feature present / node absent) —
they should survive Spark version bumps that rename minor details.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    def plan_of(name: str) -> str:
        df = REGISTRY.all()[name].build(spark, SF_SMALL)
        return df._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_q1_pushes_filter_and_stays_integer(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # r9 fixed-point rewrite + r10 overflow guard v2: per-row products
    # and BOTH accumulators stay BIGINT (hi/lo split — integer codegen
    # end to end); exactly one DECIMAL(38,0) multiply-add per GROUP
    # recombines hi_sum * 2^20 + lo_sum, so a ~1.1e11-magnitude charge
    # sum cannot wrap 2^63 before ~9e13 rows.
    import re

    assert ">> 20" in p and "& 1048575" in p, "hi/lo split accumulators"
    # no per-row decimal SUM buffer remains (the DECIMAL(38,0)
    # recombine is per-group, in the final projection — its presence
    # in the SQL text is pinned by test_advice_fixes_r10; the plan's
    # expression lists are truncated in toString so it may not print)
    assert not re.search(r"sum\(cast\([^)]*decimal", p.lower())
    # the simple sums (qty/price) remain pure-bigint buffers
    assert re.search(r"sum\(q_c#\d+L\)", p) and re.search(r"sum\(p_c#\d+L\)", p)


def test_topk_avoids_full_sort(plans):
    assert "TakeOrderedAndProject" in plans("topk_orders")


def test_scan_projection_prunes_columns(plans):
    p = plans("scan_project_filter")
    assert "PushedFilters" in p and "ReadSchema" in p


def test_dict_get_broadcasts_dimension(plans):
    assert "BroadcastHashJoin" in plans("dict_get_region")


def test_bpe_ends_in_topk(plans):
    p = plans("text_bpe_merge_stats")
    assert "TakeOrderedAndProject" in p
    # only the text column is read
    assert "ReadSchema: struct<text:string>" in p


def test_no_cartesian_in_flagships(plans):
    for name in (
        "q5_local_supplier",
        "dedup_minhash_lsh",
        "asof_join_events_orders",
        "events_limit_by",
    ):
        p = plans(name)
        assert "CartesianProduct" not in p, name


def test_limit_by_prunes_rank_inside_window(plans):
    # the ranked-window shape: a WindowGroupLimit (or at minimum no
    # global sort before the window) keeps per-group top-k bounded
    p = plans("events_limit_by")
    assert "WindowGroupLimit" in p or "RunningWindowFunction" in p


def test_topk_values_prunes_rank_and_columns(plans):
    # events_topk_values: the rn <= 3 filter should push a
    # WindowGroupLimit under the ranking window, and the scan should
    # read only (user_id, event_type) of the 6 event columns
    p = plans("events_topk_values")
    assert "WindowGroupLimit" in p or "RunningWindowFunction" in p
    assert "ReadSchema: struct<user_id:bigint,event_type:string>" in p


def test_running_difference_single_window_pass(plans):
    # one window exchange (hash by user_id), no extra sort after the
    # window's own — LAG and the projection share the pass
    p = plans("events_running_difference")
    assert p.count("Window") >= 1
    assert "CartesianProduct" not in p


def test_ngram_distance_plans_topk(plans):
    p = plans("text_ngram_distance")
    assert "TakeOrderedAndProject" in p
    # the needle gram-set is a 1-row broadcast, not a shuffled join
    assert "SortMergeJoin" not in p


def test_with_fill_broadcasts_calendar(plans):
    p = plans("events_with_fill_step")
    # extent (1 row) and calendar (types x days) are broadcast sides
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_mwu_two_phase_partial_agg(plans):
    p = plans("stats_mann_whitney_u")
    # the distinct-value grouping must run with map-side combine
    assert "partial_sum" in p or "HashAggregate" in p
    # no global per-row window remains (the whole point of the
    # two-phase form — the window runs over the tiny by_v relation)
    assert p.count("Window") <= 2


def test_sql_using_view_hits_datasource(plans):
    p = plans("native_sql_using_view")
    assert "clickhouse_native" in p.lower() or "BatchEvalPython" in p or "PythonDataSource" in p


def test_select_except_prunes_schema(plans):
    p = plans("select_except_modifier")
    # the excluded columns never reach the scan
    assert "props" not in p and "value" not in p.replace("values", "")


def test_simple_linreg_single_aggregation_pass(plans):
    p = plans("stats_simple_linreg")
    # power sums: one grouped aggregate (partial+final around one
    # exchange), closed form in the projection — no join, no window
    assert p.count("Exchange") == 1
    assert "Join" not in p and "Window" not in p
    assert "l_partkey" not in p  # schema pruned to the three used cols


def test_numbers_range_is_parallel_leaf(plans):
    p = plans("tf_numbers_range")
    # spark.range is a parallel generated leaf; one agg exchange above
    assert "Range (" in p
    assert "Scan" not in p  # no storage scan anywhere


def test_sum_foreach_two_level_aggregation(plans):
    p = plans("agg_sum_foreach")
    # (grp,pos) partial sums then grp assembly: exactly two exchanges,
    # generator stays codegen-adjacent (no Python UDF anywhere)
    assert p.count("Exchange") == 2
    assert "Generate" in p and "BatchEvalPython" not in p


def test_group_bitmap_single_user_shuffle(plans):
    p = plans("events_group_bitmap")
    # distinct-membership pass: shuffles keyed on user_id, then a
    # 1-row global aggregate; no join of per-type sets
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_prewhere_scan_pushes_both_filters(plans):
    p = plans("native_prewhere_scan")
    # both predicates were absorbed by pushFilters (evaluated by
    # _iter_blocks_prewhere executor-side): the Python BatchScan has
    # NO residual Filter node above it, and the projection is pruned
    # to the four requested columns
    assert "BatchScan clickhouse_native" in p
    # ("RuntimeFilters: []" on the scan line is not a Filter node)
    assert "+- Filter" not in p and "Filter (" not in p, (
        "pushed filters must leave no residual Filter node"
    )
    assert "doc_id" in p and "text" in p


def test_projection_agg_reads_projection_not_table(plans):
    """native_projection_agg must plan a scan of the tiny
    _projection_<name> relation (merge of partials), not the full
    documents directory."""
    p = plans("native_projection_agg")
    # the BatchScan's toString omits the path, but the partial-state
    # columns exist ONLY in the projection relation — their presence
    # (and the absence of the raw text/n_chars columns) proves the
    # merge reads _projection_by_lang_source, not documents
    assert "cnt__rows" in p and "sum__n_chars" in p
    import re

    assert "text#" not in p and not re.search(r"(?<!_)n_chars#", p)
    # one shuffle: the groupBy(lang) over the partial relation
    assert p.count("Exchange hashpartitioning") <= 1


def test_optimize_dedup_single_shuffle_dedup(plans):
    """full-row dedup plans as one hash aggregate over all columns
    (no join, no window)."""
    p = plans("optimize_table_dedup")
    assert "SortMergeJoin" not in p and "Window" not in p


def test_multi_search_stays_codegen(plans):
    """INSTR probes compile into whole-stage codegen — no Python eval
    node and no exchange (map-only)."""
    p = plans("text_multi_search")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_array_set_functions_map_only(plans):
    p = plans("array_set_functions")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_encoding_funcs_map_only(plans):
    p = plans("scalar_encoding_funcs")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_ip_funcs_single_distinct_shuffle(plans):
    """one shuffle for the DISTINCT user_id; the octet math is pure
    codegen above it."""
    p = plans("scalar_ip_funcs")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange hashpartitioning") <= 1


def test_cumulative_uniques_window_input_is_aggregated(plans):
    """the prefix-sum window runs over the per-day relation (bounded
    key set), never over the fact table: the Window node sits above
    aggregates, and the plan carries no per-event window pass."""
    p = plans("events_cumulative_uniques")
    assert "Window" in p
    # the fact-table columns are gone before the window: only day /
    # new_users style columns remain in the Window's subtree output
    import re

    win_seg = p[p.index("Window"):]
    assert not re.search(r"user_id#\d+", win_seg.split("HashAggregate")[0])


def test_strict_funnel_single_window_pass(plans):
    """all K-1 LEADs share ONE user-keyed window pass (same frame),
    then one aggregate — no join, no repeated sorts."""
    p = plans("events_window_funnel_strict")
    import re

    assert len(re.findall(r"^\s*[:+]?- Window", p, re.M)) <= 1 or p.count("Window") <= 2
    assert "Join" not in p


def test_student_ttest_one_aggregation_chain(plans):
    p = plans("stats_student_ttest")
    assert "Join" not in p and "Window" not in p


def test_transform_func_map_only(plans):
    p = plans("scalar_transform_func")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_spearman_no_global_row_window(plans):
    """the two-phase rank must not plan a global per-row window: every
    Window node's required ordering is either bucket-partitioned or
    over the tiny bucket relation — concretely, no Window may consume
    the raw fact rows (the plan's windows sit above HashAggregates)."""
    p = plans("stats_spearman_corr")
    # windows exist (bucket cumsums) but each is fed by an aggregate,
    # never directly by the scan: between any Scan and the first
    # Window there must be a HashAggregate
    scan_pos = p.find("Scan ")
    win_pos = p.find("Window")
    agg_pos = p.find("HashAggregate")
    assert win_pos != -1 and agg_pos != -1
    assert agg_pos < win_pos or scan_pos > win_pos


def test_datetime_family_map_only(plans):
    for name in (
        "scalar_format_datetime",
        "scalar_parse_datetime",
        "scalar_date_arithmetic",
    ):
        p = plans(name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name
        assert "Exchange" not in p, name
