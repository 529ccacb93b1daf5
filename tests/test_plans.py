"""Plan-shape regression tests: the scale contract as assertions.

Each test pins a physical-plan property that the 100 TB design depends on.
If a refactor silently turns a broadcast join into a shuffle join, drops a
pushed filter, or introduces a global sort into a top-k, these fail."""

import pytest

from hiero_spark import plans as P
from hiero_spark.registry import all_queries


@pytest.fixture(scope="module")
def qs(spark, sf_dir):
    specs = all_queries()
    return {name: spec.fn(spark, sf_dir) for name, spec in specs.items()}


def test_filter_queries_push_to_scan(qs):
    # Every filtered scan query must reach the parquet reader as PushedFilters
    for name in ("q1_pricing_summary", "q6_forecast_revenue", "p2_range_filter",
                 "q3_shipping_priority", "a15_find"):
        assert P.pushed_filters(qs[name]), f"{name}: no filters pushed to scan"


def test_q6_prunes_columns(qs):
    # Q6 touches 4 lineitem columns; the scan must not read the whole row
    schemas = P.scan_read_schemas(qs["q6_forecast_revenue"])
    assert schemas and all(s.count(",") <= 3 for s in schemas), schemas


def test_star_joins_broadcast_dims(qs):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume",
                 "q10_returned_items"):
        assert P.broadcast_join_count(qs[name]) >= 1, f"{name}: no broadcast join"
    # q5 joins nation AND region as broadcasts
    assert P.broadcast_join_count(qs["q5_local_supplier_volume"]) >= 2


def test_topk_uses_take_ordered_not_global_sort(qs):
    # top-k queries must use TakeOrderedAndProject (per-partition top-k +
    # merge of K-row partials), never a full Sort of the data
    for name in ("a13_next_k", "q3_shipping_priority", "n2_ann_brute_force",
                 "a8_heavy_hitters"):
        assert P.has_node(qs[name], "TakeOrderedAndProject"), f"{name}"


def test_aggregations_are_partial_then_final(qs):
    # group aggs must show two HashAggregate phases (map-side combine)
    for name in ("q1_pricing_summary", "a4_histogram_numeric", "a6_heatmap"):
        names = P.node_names(qs[name])
        assert sum("HashAggregate" in n for n in names) >= 2, f"{name}: {names}"


def test_queries_run_in_codegen(qs):
    # flagship plans must contain whole-stage-codegen spans
    for name in ("q1_pricing_summary", "q3_shipping_priority"):
        assert P.whole_stage_codegen_ids(qs[name]), f"{name}: no codegen span"


def test_semi_join_stays_semi(qs):
    # Q4's EXISTS must compile to a semi join (no row duplication + no
    # post-join dedup)
    plan = P.plan_str(qs["q4_order_priority"])
    assert "LeftSemi" in plan


def test_decontamination_is_semi_join_no_cartesian(qs):
    # train-shingle containment must stay a (deduped) semi join — a refactor
    # to an inner join would duplicate eval rows per matching shingle, and a
    # cartesian product is the 100 TB death sentence
    plan = P.plan_str(qs["n6_decontamination"])
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_hashed_decontamination_semi_join_on_longs(qs):
    # same shape contract as the string variant, plus: no gram string may
    # reach the join — the semi join's key must be the xxhash64 long
    plan = P.plan_str(qs["n6_decontamination_hashed"])
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "xxhash64" in plan.lower()


def test_hashed_decontamination_shuffles_fewer_bytes(qs):
    # the point of the hashed variant: 8-byte join keys must beat gram
    # strings on shuffle volume (measured ~35% lower at sf0.01)
    string_bytes = P.shuffle_bytes_written(qs["n6_decontamination"])
    hashed_bytes = P.shuffle_bytes_written(qs["n6_decontamination_hashed"])
    assert 0 < hashed_bytes < string_bytes


def test_q21_exists_shapes_stay_semi_anti(qs):
    # Q21's EXISTS/NOT EXISTS pair must lower to one semi and one anti
    # join — an inner-join rewrite would duplicate (order, supplier) rows
    # and a nested-loop over the fact table is the 100 TB death sentence
    plan = P.plan_str(qs["q21_waiting_suppliers"])
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "Cartesian" not in plan


def test_q20_heavy_supplier_chain_is_semi_join(qs):
    plan = P.plan_str(qs["q20_green_part_suppliers"])
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_vocab_topk_lowers_to_take_ordered(qs):
    # the vocabulary build must do partial+final counting and a per-partition
    # top-k merge, never a global sort of the token counts
    assert P.has_node(qs["n6_vocab_topk"], "TakeOrderedAndProject")
    names = P.node_names(qs["n6_vocab_topk"])
    assert sum("HashAggregate" in n for n in names) >= 2


def test_q22_not_exists_is_anti_join(qs):
    # NOT EXISTS must stay a LeftAnti join; the scalar avg threshold rides a
    # broadcast, never a per-row subquery
    plan = P.plan_str(qs["q22_global_sales_opportunity"])
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan


def test_progressive_merge_final_single_shuffle_layer(qs):
    # the merged progressive plan must still aggregate partial+final (the
    # monoid merge compiles to ordinary re-aggregation, not a driver loop)
    names = P.node_names(qs["prog_merge_final"])
    assert sum("HashAggregate" in n for n in names) >= 2


def test_repetition_stats_is_shuffle_free(qs):
    """Gopher repetition signals are per-row exprs: one scan + project, no
    Exchange anywhere (the sorted-array run-length replaces the obvious
    explode+groupBy 2-gram count, which would shuffle 2x the token count)."""
    names = P.node_names(qs["n4_repetition_stats"])
    assert not any("Exchange" in n for n in names), names


def test_url_dedup_single_aggregation_shuffle(qs):
    """URL dedup = canonicalize (narrow) + one groupBy: exactly one
    exchange layer, partial+final aggregation on either side of it."""
    names = P.node_names(qs["n1_url_dedup"])
    assert sum("Exchange" in n for n in names) == 1, names
    assert sum("HashAggregate" in n for n in names) >= 2, names


def test_boilerplate_removal_uses_anti_join_no_sort(qs):
    """Hot-line removal must lower to a (broadcast|shuffled) anti join and
    reassembly must be agg-side (array_sort expr), never a global Sort."""
    plan = P.plan_str(qs["n5_boilerplate_removal"])
    assert "LeftAnti" in plan, plan[:800]
    names = P.node_names(qs["n5_boilerplate_removal"])
    assert not any(n.strip() == "Sort" for n in names), names


def test_grouped_topk_first_window_is_salted(qs):
    """The salted per-group top-k's phase-1 exchange must partition by
    (group, salt) — partitioning by the group alone is exactly the
    few-huge-groups serialization the operator exists to avoid. The salt
    expression is pmod(xxhash64(...)), so the first hashpartitioning
    spec must mention it."""
    import re

    plan = P.plan_str(qs["n5_topk_per_group"])
    specs = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert specs, plan[:500]
    # phase 1: two partition exprs (group + projected salt) before the
    # numPartitions arg; phase 2: the group alone
    assert len(specs[0].split(",")) == 3, specs
    assert len(specs[-1].split(",")) == 2, specs
    # and the salt really is the deterministic hash, not rand/partition-id
    assert "xxhash64" in plan and "pmod" in plan, plan[:500]


def test_line_dedup_keeper_is_aggregate_not_window(qs):
    """Keep-first line dedup must choose keepers with a partial+final
    min(struct) aggregation (map-side combine absorbs hot-line skew) —
    never a Window over the line (which buffers every copy of a
    boilerplate line in one task)."""
    names = P.node_names(qs["n1_line_dedup_keep_first"])
    assert not any("Window" in n for n in names), names
    assert sum("HashAggregate" in n for n in names) >= 2, names


def test_incremental_dedup_is_anti_join(qs):
    plan = P.plan_str(qs["n1_dedup_incremental"])
    assert "LeftAnti" in plan, plan[:800]


def test_bm25_df_join_is_broadcast_hash(qs):
    """The per-term document-frequency table is |q| rows — its join onto
    the tf relation must be a broadcast HASH join (keyed on tok), never
    a shuffle of the postings side or a nested loop."""
    plan = P.plan_str(qs["n4_bm25_topk"])
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_weighted_sample_single_data_shuffle(qs):
    """The PPS sampler's only data movement is the range repartition for
    the prefix sum; the per-partition offset table joins by broadcast.
    A SortMergeJoin here would mean the tiny offset table shuffled the
    data a second time."""
    plan = P.plan_str(qs["n6_weighted_sample"])
    assert "SortMergeJoin" not in plan, plan[:800]


def test_jaccard_join_carries_no_arrays_through_candidates(qs):
    """Candidate generation must join on bare (tok, id, size) triples —
    the shingle arrays join back AFTER pair dedup. If the candidate
    self-join's sort-merge keys sort rows carrying the `s` array, the
    arrays are riding the hot shuffle again."""
    import re

    plan = P.plan_str(qs["n1_jaccard_join"])
    # every join is KEYED (hash or sort-merge — AQE broadcasts at this
    # tiny plan scale); no CartesianProduct / BNLJ anywhere
    names = P.node_names(qs["n1_jaccard_join"])
    joins = [n for n in names if "Join" in n]
    assert joins and all(
        "BroadcastHashJoin" in n or "SortMergeJoin" in n or "ShuffledHashJoin" in n
        for n in joins
    ), joins
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_rolling_distinct_is_bounded_fanout(qs):
    """rolling_distinct must aggregate (never window over raw events) and
    must not sort globally; the explode fan-out is bounded by the
    window length."""
    names = P.node_names(qs["ext_rolling_distinct"])
    assert any("HashAggregate" in n for n in names), names
    # no exchange feeding a global sort: any Sort must sit above a
    # partition-local boundary, not a range-partitioned shuffle (a global
    # orderBy would show Exchange rangepartitioning in the plan string)
    plan = P.plan_str(qs["ext_rolling_distinct"])
    assert "rangepartitioning" not in plan.lower(), plan
    assert any("Generate" in n for n in names), names  # the bounded explode


def test_curriculum_order_uses_window_group_limit(qs):
    """The rank<=50 filter must push a Partial WindowGroupLimit below the
    per-stage exchange — without it every stage's full membership sorts
    on one reducer, the scale-killer the docstring rules out."""
    plan = P.plan_str(qs["n6_curriculum_order"])
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_containment_join_carries_no_arrays_through_candidates(qs):
    """Same invariant as the jaccard join: the shingle arrays join back
    onto the deduped pair list; they never ride the token self-join."""
    plan = P.plan_str(qs["n1_containment_join"])
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["n1_jaccard_join", "n1_containment_join", "n1_jaccard_join_hashed"]
)
def test_setsim_verify_stage_is_rewidened_by_key(qs, name):
    """Round-14: the deduped pair list is a few bytes per pair, so AQE's
    byte-targeted coalescing collapsed its shuffle to ONE partition and
    the verify stage (array joins + per-pair array_intersect, the
    CPU-dense step) ran on one core — measured 4.0 s -> 1.35 s at sf0.1
    after the keyed re-widen.  Pin the explicit keyed repartition
    (REPARTITION_BY_NUM on id_a) so a refactor can't silently drop it
    and re-serialize the verify onto one core."""
    import re

    plan = P.plan_str(qs[name])
    assert re.search(r"hashpartitioning\(id_a#\d+L?[^)]*\), REPARTITION_BY_NUM",
                     plan), name


def test_jaccard_groups_plan_is_keyed_and_array_free(qs):
    """The group arm inherits the jaccard scale contract: candidate
    generation joins on bare (tok, id, size) triples, every join is
    keyed, and no cartesian/BNLJ appears anywhere in the plan."""
    plan = P.plan_str(qs["n1_jaccard_groups"])
    names = P.node_names(qs["n1_jaccard_groups"])
    joins = [n for n in names if "Join" in n]
    assert joins and all(
        "BroadcastHashJoin" in n or "SortMergeJoin" in n or "ShuffledHashJoin" in n
        for n in joins
    ), joins
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


@pytest.mark.parametrize(
    "name",
    ["n6_stratified_sample", "n6_mixture_apply", "n6_curriculum_order",
     "ext_window_rank"],
)
def test_upgraded_group_rankings_are_salted(qs, name):
    """Round-10: every low-cardinality group ranking that moved onto
    grouped_topk must actually show the salted phase-1 exchange — a
    refactor back to the single-window form would re-serialize whole-
    corpus strata onto one task each."""
    import re

    plan = P.plan_str(qs[name])
    specs = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert specs, plan[:500]
    assert any(len(s.split(",")) >= 3 for s in specs), (name, specs)
    assert "xxhash64" in plan and "pmod" in plan, (name, plan[:500])


def test_hash_sample_is_shuffle_free_map_filter(qs):
    """n6_hash_sample (round 11) is a content-addressed Bernoulli sample:
    md5-threshold predicate evaluated row-local at the scan — one scan +
    filter + project, no Exchange anywhere.  If a shuffle appears, the
    sampler stopped being the narrow map-side operation its 100 TB story
    depends on."""
    names = P.node_names(qs["n6_hash_sample"])
    assert not any("Exchange" in n for n in names), names
    plan = P.plan_str(qs["n6_hash_sample"])
    assert "Filter" in plan, plan


# Round-11 verdict #5: the bench tail carried unattributed
# `WindowExec: No Partition Defined` warnings.  These are the sites —
# every registered query whose physical plan contains a window with an
# EMPTY partition spec, each with the reason its single-partition pass
# is bounded (the warning is about moving ALL data to one task; over a
# bounded aggregate it is cosmetic).  bench.py quiets the WindowExec
# logger citing this pin; a NEW name appearing here fails the test and
# must either partition its frame or justify a new allowlist row.
_UNPARTITIONED_WINDOW_SITES = {
    "a5_cdf": "cumulative sum over the histogram-bucket aggregate "
              "(rows = bucket count, <=100)",
    "a18_skew_audit": "cumulative share over the per-key-count frequency "
                      "aggregate (rows = distinct count-of-counts)",
    "ext_cusum_changepoint": "CUSUM fold over the DAILY aggregate "
                             "(rows = distinct days; windows never touch "
                             "the fact table)",
    "n2_hybrid_rrf": "global rank over the per-document fused score "
                     "aggregate of ONE query's candidate set",
    "n2_recall_at_k": "rank over the eval arm's per-candidate scores "
                      "(bounded candidate list)",
    "n6_dataset_drift": "PSI running total over length-bucket aggregate "
                        "(rows = bucket count)",
    "n6_global_shuffle": "row_number over a TakeOrderedAndProject "
                         "limit(200) — the window input is 200 rows "
                         "by construction",
    "n6_mixture_apply": "cumulative mixture offsets over the per-source "
                        "aggregate (rows = number of sources)",
    "n6_mixture_weights": "same per-source aggregate as mixture_apply",
    "n6_oov_curve": "frequency rank over the token-vocabulary aggregate "
                    "(rows = distinct tokens, already one "
                    "groupBy-reduction below the corpus)",
}

_BOUNDING_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate",
                   "TakeOrderedAndProject", "Limit", "LocalTableScan")


def _unpartitioned_window_depths(plan: str) -> list[tuple[int, int]]:
    """(line_index, prefix_len) of each Window node whose
    windowspecdefinition has no partition columns: the first argument
    either carries a sort direction (order-only spec) or is the frame
    itself."""
    import re

    out = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r"\bWindow \[", line)
        if not m:
            continue
        spec = re.search(
            r"windowspecdefinition\(([^()]*?)(?:, specifiedwindowframe|\))",
            line,
        )
        first = spec.group(1).split(",")[0].strip() if spec else ""
        bare_frame = re.search(r"windowspecdefinition\(specifiedwindowframe",
                               line)
        if bare_frame or first == "" or " ASC" in first or " DESC" in first:
            out.append((i, m.start()))
    return out


_TREE_PREFIX_UNITS = {":  ", "   ", "+- ", ":- "}


def _tree_prefix_depth(line):
    """Tree depth of a Spark plan line = number of leading 3-char prefix
    units (':  ', '   ', '+- ', ':- ') before the node text; None for a
    line that is not a tree node (blank, subquery header, etc.)."""
    if not line.strip():
        return None
    d = 0
    while line[d * 3 : d * 3 + 3] in _TREE_PREFIX_UNITS:
        d += 1
    rest = line[d * 3 :]
    if not rest or rest[0] == " ":
        return None
    return d


def test_unpartitioned_windows_pinned_and_bounded(qs):
    """Exact-set pin of every unpartitioned-window site, plus a
    structural boundedness check: the subtree feeding each such window
    must contain an aggregation/limit boundary, so the single-partition
    pass runs over a reduction, never over raw table rows."""
    found = {}
    for name, df in qs.items():
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            continue
        sites = _unpartitioned_window_depths(plan)
        if sites:
            found[name] = (plan, sites)

    assert set(found) == set(_UNPARTITIONED_WINDOW_SITES), (
        "unpartitioned-window site set drifted; new sites must partition "
        f"their frame or earn an allowlist row: "
        f"{sorted(set(found) ^ set(_UNPARTITIONED_WINDOW_SITES))}"
    )

    for name, (plan, sites) in found.items():
        lines = plan.splitlines()
        for idx, _depth in sites:
            # Slice the window's OWN input subtree by parsing the tree
            # prefix depth (3-char units ':  '/'   '/'+- '/':- ') and
            # stopping at the first line at or above the window's depth
            # (round-12 ADVICE: the old startswith/char-probe heuristic
            # almost never terminated, so the bounding assertion could
            # match a sibling subtree below the window).  An unparsable
            # line also terminates — under-approximating the subtree
            # only makes the check stricter.
            wdepth = _tree_prefix_depth(lines[idx])
            subtree = []
            for line in lines[idx + 1:]:
                d = _tree_prefix_depth(line)
                if d is None or d <= wdepth:
                    break
                subtree.append(line)
            sub = "\n".join(subtree)
            assert any(n in sub for n in _BOUNDING_NODES), (
                f"{name}: unpartitioned window at line {idx} has no "
                f"aggregate/limit boundary in its input subtree\n{sub[:800]}"
            )


def test_hash_sample_grouped_is_shuffle_free_map_filter(qs):
    """n6_mixture_hash_sample (round 12): the grouped sampler compiles
    to the same narrow shape as n6_hash_sample — one scan + CASE-bearing
    filter + project, no Exchange, no join against a fractions table
    (the dict folds into the predicate)."""
    names = P.node_names(qs["n6_mixture_hash_sample"])
    assert not any("Exchange" in n for n in names), names
    assert not any("Join" in n for n in names), names
    plan = P.plan_str(qs["n6_mixture_hash_sample"])
    assert "Filter" in plan, plan


def test_kmin_sample_uses_take_ordered_not_global_sort(qs):
    """n6_kmin_sample (round 12): bottom-k by digest must compile to
    TakeOrderedAndProject (per-partition heaps + one k-row merge) —
    a global Sort of the corpus by hash would be the scale-killer the
    operator exists to avoid."""
    assert P.has_node(qs["n6_kmin_sample"], "TakeOrderedAndProject")
    names = P.node_names(qs["n6_kmin_sample"])
    assert not any(n.strip().startswith("Sort") for n in names), names


def test_kmin_sample_grouped_uses_window_group_limit(qs):
    """n6_kmin_sample_grouped (round 13): the per-group bottom-k must
    compile to the two-phase WindowGroupLimit — each map task keeps its
    local per-group k BEFORE the one hash exchange on the group column,
    then the final phase trims after; the Sort nodes are within-
    partition window sorts, never a rangepartitioning global sort."""
    names = [n.strip() for n in P.node_names(qs["n6_kmin_sample_grouped"])]
    assert names.count("WindowGroupLimit") == 2, names
    assert sum(1 for n in names if n.startswith("Exchange")) == 1, names
    plan = P.plan_str(qs["n6_kmin_sample_grouped"])
    assert "hashpartitioning" in plan
    assert "rangepartitioning" not in plan


def test_weighted_race_sample_take_ordered_not_global_sort(qs):
    """n6_weighted_race_sample (round 13): the exponential-race bottom-k
    inherits kmin's shape — TakeOrderedAndProject, never a global Sort
    of the corpus by score."""
    assert P.has_node(qs["n6_weighted_race_sample"], "TakeOrderedAndProject")
    names = P.node_names(qs["n6_weighted_race_sample"])
    assert not any(n.strip().startswith("Sort") for n in names), names


@pytest.mark.parametrize(
    "name", ["n5_rejection_reasons", "n5_curation_funnel"]
)
def test_text_gate_scan_is_fanned_out(qs, name, spark):
    """Round-14: the single-file documents table scans as ONE task, so
    the CPU-dense gate expressions (top_2gram_share's per-doc array_sort
    above all) ran on one core — measured 1.87 -> 1.00 s
    (n5_rejection_reasons, noop min-of-3 at sf0.1) after fan_out.  Pin
    the keyed repartition.  fan_out only fires when the scan arrives
    narrower than the session parallelism (it is a no-op on a real
    multi-file corpus or a 1-core runner — round-14 ADVICE), so the pin
    is guarded on the condition that makes it bind."""
    import re

    if spark.sparkContext.defaultParallelism <= 1:
        pytest.skip("fan_out is rightly a no-op at parallelism 1")
    plan = P.plan_str(qs[name])
    assert re.search(
        r"hashpartitioning\(doc_id#\d+L?[^)]*\), REPARTITION_BY_NUM", plan
    ), name


def test_curation_funnel_gates_computed_once(qs):
    """Round-14: `flagged` feeds TWO consumers — the 14-column gates
    aggregate and the exact-dedup branch — and the tracked persist makes
    both read the cached gate booleans instead of re-running every text
    gate (guide §1.2).  Two InMemoryTableScan consumers = one gate
    computation."""
    plan = P.plan_str(qs["n5_curation_funnel"])
    assert plan.count("InMemoryTableScan") >= 2, plan[:800]


def test_bm25_single_tokenize_pass(qs):
    """Round-14: bm25_topk's corpus-stats aggregate and hits path used
    to EACH re-run the corpus tokenize (two full passes).  Both now read
    one metadata-slim persisted relation (id, dl, query-term hits —
    never the text or full token arrays); the declared plan's hits side
    must read that cache, not re-tokenize from parquet.  Round-15
    (r14 ADVICE): ALSO pin that no second scan of the documents table
    survives anywhere in the declared plan — 'some cache appears' alone
    would still pass if one consumer quietly fell off the cache."""
    plan = P.plan_str(qs["n4_bm25_topk"])
    assert "InMemoryTableScan" in plan, plan[:800]
    n_doc_scans = plan.count("documents.parquet")
    assert n_doc_scans <= 1, (
        f"{n_doc_scans} parquet scans of documents in the bm25 plan — "
        "a consumer stopped sharing the single tokenize cache"
    )
