"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementations live in ``adv_big_data_indexing_spark``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from adv_big_data_indexing_spark.contract import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001.

    The reference's signature capability (SURVEY.md §2.C): a has_child
    semi-join — "parents having ≥1 child matching a predicate"
    (allParentsHaving, apiLogicForSearch.ts:245-294) — followed by
    OP-C1-style reconstruction nesting the child objects back under the
    parent, here rendered on the star schema: customers having an
    urgent high-value order, with those orders re-nested as an
    objectId-sorted array<struct>.
    """
    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.sources.catalog import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    c = load_table(spark, SMOKE_SF_DIR, "customer")
    o = load_table(spark, SMOKE_SF_DIR, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200000.0)
    )
    parents = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    nested = o.groupBy("o_custkey").agg(
        F.array_sort(
            F.collect_list(F.struct("o_orderkey", "o_totalprice", "o_orderdate"))
        ).alias("urgent_orders"),
        F.count("*").alias("n_urgent"),
    )
    return parents.join(nested, parents.c_custkey == nested.o_custkey).select(
        "c_custkey", "c_name", "c_mktsegment", "n_urgent", "urgent_orders"
    )


# The driver verifies the first 50 queries() keys in alphabetical order per
# round. An alias layer rotates which registry slice sorts into that window
# each round: the names below are exported as `a_<name>` so they sort first;
# everything else keeps its registry name. Registry names themselves are
# unchanged — COVERAGE.md lockstep and tests use the canonical names.
# docs/ROTATION_LEDGER.md (tools/rotation_ledger.py) records each query's
# last driver-green round so staleness is auditable.
#
# Round 11 window (regenerated docs/ROTATION_LEDGER.md from CORRECTNESS_r10
# FIRST; all 50 r10 rows green, so the r10 window retires whole). Priority
# order per VERDICT r10 item 1:
#   1. ext_triangle_count LEADS — its physical plan changed in r10
#      (commit 4beb990, explicit broadcast on the scalar crossJoin side)
#      under the local-parity fallback with no driver slot, so its
#      CURRENT plan has never been driver-checked;
#   2. ALL 37 r6-stale rows (the oldest tier in the regenerated ledger);
#   3. 11 oldest-r7 rows alphabetical (doc_etag_pipeline ..
#      ext_not_in_null);
#   4. the 1 remaining slot is the round-11 displacement budget:
#      ext_fuzzy_join_token_recall (impl changes this round — ADVICE r10
#      zero-exact guard on the recall division, both engines). Any
#      further mid-round impl change displaces from the TAIL of the r7
#      block (never an r6 row or the lead row).
# After this round no green row is older than r7.
_DRIVER_WINDOW_R11 = (
    # --- plan changed in r10 with no driver slot (fallback rule) ---
    "ext_triangle_count",
    # --- all 37 r6-stale rows ---
    "doc_parents_having",
    "doc_roundtrip_flat",
    "doc_search_rehydrated",
    "doc_shred_entities",
    "ext_agg_cube",
    "ext_agg_distinct",
    "ext_agg_rollup",
    "ext_approx_distinct_portable",
    "ext_approx_percentile",
    "ext_argmax",
    "ext_bitwise",
    "ext_bloom_semijoin",
    "ext_conditionals",
    "ext_correlated_above_avg",
    "ext_grouping_id",
    "ext_grouping_sets",
    "ext_histogram",
    "ext_join_anti",
    "ext_join_broadcast_star",
    "ext_join_full_outer",
    "ext_join_left_null",
    "ext_join_tpch_q5",
    "ext_tpch_q10_shape",
    "ext_tpch_q13_shape",
    "ext_tpch_q15_shape",
    "ext_tpch_q16_shape",
    "ext_tpch_q17_shape",
    "ext_tpch_q19_shape",
    "ext_tpch_q22_shape",
    "ext_tpch_q4_shape",
    "ext_tpch_q6_shape",
    "ext_tpch_q8_shape",
    "ext_tpch_q9_shape",
    "ns_minhash_jaccard_estimate",
    "ts_ooo_audit",
    "ts_seasonal_decompose",
    "ts_survival_km",
    # --- 11 oldest-r7 rows, alphabetical ---
    "doc_etag_pipeline",
    "doc_get_mapping",
    "ext_array_ops",
    "ext_auc_exact",
    "ext_equidepth_histogram",
    "ext_join_size_estimate",
    "ext_json_extract",
    "ext_listagg",
    "ext_mad_outliers",
    "ext_map_ops",
    "ext_not_in_null",
    # --- implementation changes during round 11 (displacement budget) ---
    "ext_fuzzy_join_token_recall",  # ADVICE r10: zero-exact guard on the
    #                      recall division (CASE WHEN / F.when on both
    #                      engines) so a degenerate slice yields NULL in
    #                      both rather than NaN-vs-NULL divergence
)

# ROUND-12 ROTATION PLAN: regenerate docs/ROTATION_LEDGER.md from
# CORRECTNESS_r11 FIRST, then fill in this priority order:
#   1. the ~36 remaining r7-stale rows (ext_percentile, ext_pivot,
#      ext_posexplode, the op_a* block, ...; trust the REGENERATED
#      ledger, never this comment);
#   2. the remaining slots from oldest-r8 alphabetical;
#   3. any query whose implementation changes during round 12
#      displaces from the TAIL of the r8 block (never an r7 row).
# After r12 no green row should be older than r8.

def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R11 else name


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Event-time semantics and timestamp hashing assume UTC.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    out = {_driver_name(name): wrap(spec.fn) for name, spec in registry().items()}
    return dict(sorted(out.items()))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    out = {
        _driver_name(name): spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
    return dict(sorted(out.items()))
