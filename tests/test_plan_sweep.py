"""Repo-wide scale-killer sweep: every registered query's physical plan is
checked for the patterns that break at 100 TB.

- CartesianProduct: never allowed, no exceptions.
- BroadcastNestedLoopJoin: allowed ONLY on the documented allowlist —
  every entry is either (a) a scalar-broadcast join (a 1-row aggregate
  joined with no key: the standard scalar-subquery shape; the broadcast
  side is one row by construction) or (b) a deliberately-quadratic
  ground-truth audit arm that runs at oracle scale only.  A new query
  that trips BNLJ must be fixed or consciously added here with a reason.

The per-query plan tests in test_plans.py pin positive shapes (semi/anti
joins, broadcasts, TakeOrdered); this sweep pins the absence of negative
shapes across the WHOLE registry so a new query can't ship a scale
killer unnoticed.
"""

import pytest

from hiero_spark import plans as P
from hiero_spark.registry import all_queries

PLAN_SF = "/root/testdata/sf0.001"  # plan SHAPE only; smallest data is fine

# name -> why BNLJ is acceptable there
BNLJ_ALLOWED = {
    "q22_global_sales_opportunity": "scalar broadcast: c_acctbal > 1-row avg_bal",
    "q11_important_parts": "scalar broadcast: part_value > 1-row total",
    "o2_quantile_scroll": "scalar broadcast: 1-row exact percentile anchor",
    "a4_histogram_auto": "scalar broadcast: 1-row range sketch drives buckets",
    "a8_heavy_hitters_approx": "scalar broadcast: 1-row verdict combine",
    "a10_distinct_sketch_merge": "scalar broadcast: 1-row whole-scan estimate",
    "a14_random_sample_verdict": "scalar broadcast: 1-row size/violation counts",
    "n1_minhash_recall": "scalar broadcast: 1-row hit/false-positive counts",
    "n2_ann_lsh_verdict": "scalar broadcast: 1-row hit/self counts",
    "n2_embedding_near_dups_verdict": "all-pairs exact audit arm (oracle scale only) + 1-row combines",
    "n2_ann_batch": "intended broadcast fan-out of the bounded query set",
    "n2_ivf_kmeans": "scalar broadcast: 1-row SSE/self-probe combines",
    "n4_tfidf_keywords": "scalar broadcast: 1-row corpus size joins the tf table",
    "n6_decontamination_bloom": "scalar broadcast: 1-row miss/extra/eval-count combines",
    "n2_semantic_dedup": "scalar broadcast: 1-row planted/original kept-count combines",
    "n4_trained_classifier": "scalar broadcast: 1-row accuracy joins the anchor count",
    "n1_incremental_near_dups_verdict": "scalar broadcast: 1-row planted/found/min-jaccard combines",
    "n5_curation_funnel": "scalar broadcast: 1-row gate-counts x 1-row dedup-stage combine",
    "n7_triangle_count": "scalar broadcast: 1-row triangle x edge x node count combines",
    "n1_minhash_star_verdict": "scalar broadcast: 1-row hot-cluster size/min-id combine",
    "a10_hll_intersection_verdict": "scalar broadcast: 1-row sketch-estimate combines",
    "s19_time_travel": "scalar broadcast: 1-row per-version count combines",
    "n2_mmr_diversify": "intended broadcast fan-out of the bounded query set (batch-ANN shape)",
    "n4_pmi_collocations": "scalar broadcast: 1-row total-bigram count N joins the scored pairs",
    "ext_market_basket": "scalar broadcast: 1-row n_orders joins the scored pairs",
    "a17_join_cardinality": "scalar broadcast: 1-row stats x 1-row actual-count combines",
    "n6_oov_curve": "scalar broadcast: 1-row total-occurrences joins the 10k-row top-vocab frame",
    "n6_dataset_drift": "scalar broadcast: 1-row smoothed totals join the 10-bucket terms",
    "n2_hard_negatives": "intended broadcast fan-out of the bounded anchor set (batch-ANN shape)",
    "a18_skew_audit": "scalar broadcast: 1-row totals join the Zipf-bounded count distribution",
    "n6_triplets": "intended broadcast fan-out of the bounded anchor set (batch-ANN shape)",
    "ext_target_encoding": "scalar broadcast: 1-row global (sum, count) prior joins the category table",
}

_SPECS = all_queries()


@pytest.fixture(scope="module")
def sweep_plans(spark):
    return {name: P.plan_str(spec.fn(spark, PLAN_SF)) for name, spec in _SPECS.items()}


def test_no_cartesian_products_anywhere(sweep_plans):
    offenders = [n for n, p in sweep_plans.items() if "CartesianProduct" in p]
    assert not offenders, f"cartesian products in: {offenders}"


def test_nested_loop_joins_only_on_allowlist(sweep_plans):
    offenders = [
        n
        for n, p in sweep_plans.items()
        if "BroadcastNestedLoop" in p and n not in BNLJ_ALLOWED
    ]
    assert not offenders, (
        "unexpected BroadcastNestedLoopJoin (fix the join or allowlist with "
        f"a reason): {offenders}"
    )


def test_allowlist_entries_still_trip_bnlj(sweep_plans):
    # keep the allowlist honest: prune entries whose plans no longer need it
    stale = [
        n for n in BNLJ_ALLOWED if n in sweep_plans and "BroadcastNestedLoop" not in sweep_plans[n]
    ]
    assert not stale, f"allowlist entries no longer needed: {stale}"
