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
# Round 12 window (regenerated docs/ROTATION_LEDGER.md from CORRECTNESS_r11
# FIRST; all 50 r11 rows green, so the r11 window retires whole). Priority
# order per VERDICT r11 item 1:
#   1. ALL 36 r7-stale rows (the oldest tier in the regenerated ledger:
#      21 ext_*, 6 ns_*, 8 op_a*, ts_max_concurrency);
#   2. the 14 oldest-r8 rows alphabetical (ext_skew_salted_join ..
#      ns_hybrid_rrf_fusion);
#   3. any query whose implementation changes during round 12 displaces
#      from the TAIL of the r8 block (never an r7 row).
# After this round no green row is older than r8.
_DRIVER_WINDOW_R12 = (
    # --- all 36 r7-stale rows ---
    "ext_percentile",
    "ext_pivot",
    "ext_posexplode",
    "ext_range_join",
    "ext_referential_audit",
    "ext_rfm_segmentation",
    "ext_scalar_date",
    "ext_scalar_date_arith",
    "ext_scalar_hash",
    "ext_scalar_math",
    "ext_scalar_regex",
    "ext_scalar_string",
    "ext_setops",
    "ext_stats_moments",
    "ext_table_diff",
    "ext_topk_orderby",
    "ext_tpch_q11_shape",
    "ext_tpch_q12_shape",
    "ext_tpch_q2_shape",
    "ext_window_distribution",
    "ext_window_ntile",
    "ns_corpus_shuffle",
    "ns_dedup_exact",
    "ns_preference_pairs",
    "ns_sketch_cms_heavy_hitters",
    "ns_text_heavy_hitters",
    "ns_text_top_terms",
    "op_a10_predicate_delete",
    "op_a1_point_lookup",
    "op_a2_existence_probe",
    "op_a3_point_lookup_hash",
    "op_a5_full_scan_limit",
    "op_a6_upsert",
    "op_a7_guarded_insert",
    "op_a9_keyed_delete",
    "ts_max_concurrency",
    # --- 14 oldest-r8 rows, alphabetical (displacement comes from the
    #     TAIL of this block: ns_hybrid_rrf_fusion first, then upward) ---
    "ext_skew_salted_join",
    "ext_tpch_q18_shape",
    "ext_tpch_q3_shape",
    "ext_union_by_name",
    "ext_unpivot",
    "ext_window_frame",
    "ext_window_lag",
    "ext_window_rank",
    "ext_window_values",
    "ext_winsorized_stats",
    "ns_ann_lsh_bucketed",
    "ns_ann_lsh_recall",
    "ns_graph_link_prediction",
    "ns_hybrid_rrf_fusion",
)

# ROUND-13 ROTATION PLAN: regenerate docs/ROTATION_LEDGER.md from
# CORRECTNESS_r12 FIRST, then fill in this priority order:
#   1. the ~28 remaining r8-stale rows (trust the REGENERATED ledger,
#      never this comment);
#   2. the remaining slots from oldest-r9 alphabetical;
#   3. any query whose implementation changes during round 13 displaces
#      from the TAIL of the r9 block (never an r8 row).
# After r13 no green row should be older than r9.

def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R12 else name


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
