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
# Round 7 window = the 13 queries whose implementation changed this
# round (VERDICT r6 items 1/4/6 + ADVICE: the CMS pool-then-rank fix,
# the per-lang text top-k pooling, every rank-machinery caller —
# num_parts now derived from spark.sql.shuffle.partitions, RANGE-frame
# prefix determinism, consistent_materialize checkpoint switch — and
# the three grouped-machinery rewrites: ext_window_ntile,
# ns_corpus_shuffle, ns_preference_pairs) + the 3 NEW queries
# (ext_tpch_q2/q11/q12_shape — all 22 TPC-H patterns now ship), then
# back-fill per the committed r7 plan: ALL 19 remaining r1-only ledger
# rows, then the 15 alphabetically-first r2 rows. After this round no
# query's last driver-green is older than r2; the 14 leftover r2 rows
# (op_b1/b2/b3/b4/b5/b6, op_c1/c3/c4/c5, op_d1, op_f1/f2/f3) queue
# for r8.
_DRIVER_WINDOW_R7 = (
    # implementation changed in round 7 — need fresh rows
    "ns_sketch_cms_heavy_hitters",  # pool-then-rank (VERDICT r6 item 1)
    "ns_text_top_terms",  # _grouped_topk pooling (item 6)
    "ns_text_heavy_hitters",  # _grouped_topk pooling (item 6)
    "ext_window_distribution",  # degenerate-N guards (ADVICE r6)
    "ext_equidepth_histogram",  # machinery: derived num_parts + ckpt switch
    "ext_rfm_segmentation",  # machinery (inline melt)
    "ext_auc_exact",  # machinery + RANGE-frame prefix
    "ext_percentile",  # machinery + RANGE-frame prefix
    "ts_max_concurrency",  # machinery + RANGE-frame prefix
    "ns_negative_sampling",  # machinery (global_row_number vocab index)
    "ext_window_ntile",  # r7 grouped_ntile (no per-segment one-task frame)
    "ns_corpus_shuffle",  # r7 grouped_row_number (per-shard positions)
    "ns_preference_pairs",  # r7 grouped_topk pools (per-source ranks)
    # new in round 7 — never driver-verified (complete the 22 TPC-H patterns)
    "ext_tpch_q2_shape",
    "ext_tpch_q11_shape",
    "ext_tpch_q12_shape",
    # stalest back-fill: the 19 remaining rows whose last green was r1
    "ext_join_size_estimate",
    "ext_json_extract",
    "ext_listagg",
    "ext_mad_outliers",
    "ext_map_ops",
    "ext_not_in_null",
    "ext_posexplode",
    "ext_range_join",
    "ext_referential_audit",
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
    # then the oldest r2 rows, alphabetical
    "doc_etag_pipeline",
    "doc_get_mapping",
    "ext_array_ops",
    "ext_pivot",
    "ns_dedup_exact",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_simhash",
    "op_a10_predicate_delete",
    "op_a1_point_lookup",
    "op_a2_existence_probe",
    "op_a3_point_lookup_hash",
    "op_a5_full_scan_limit",
    "op_a6_upsert",
    "op_a7_guarded_insert",
    "op_a9_keyed_delete",
)

# ROUND-8 ROTATION PLAN: the 14 remaining r2 rows
# (op_b1_conjunctive_filter, op_b2_filter_by_id, op_b3_filter_by_routing,
# op_b4_range_predicate, op_b5_projection, op_b6_prefix_scan,
# op_c1_reconstruct_flat, op_c3_has_child_range, op_c4_has_parent,
# op_c5_edges, op_d1_hit_count, op_f1_key_synthesis, op_f2_content_hash,
# op_f3_date_validation), then the oldest r3 rows per
# docs/ROTATION_LEDGER.md (regenerate after the r7 driver run lands).

def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R7 else name


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
