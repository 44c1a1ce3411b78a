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
# Round 13 window (regenerated docs/ROTATION_LEDGER.md from CORRECTNESS_r12
# FIRST; all 50 r12 rows green, so the r12 window retires whole). Priority
# order per VERDICT r12 item 1:
#   1. ALL 28 r8-stale rows (the oldest tier in the regenerated ledger);
#   2. the 15 oldest-r9 rows alphabetical (ext_agg_groupby ..
#      ns_multimodal_decode);
#   3. the 7 queries whose implementation changed THIS round (the bk64
#      batch-LSH port — dedup._banded/_lsh_pair_stats consumers:
#      minhash_lsh, lsh_pair_recall, lsh_bucket_audit, incremental, and
#      the routed_pairs consumers components/cluster_stats/curation),
#      displacing from the TAIL of the r9 block per the rotation rule;
#      all 7 were r10-green, so they also reduce staleness.
# After this round no green row is older than r9.
_DRIVER_WINDOW_R13 = (
    # --- all 28 r8-stale rows ---
    "ns_layout_zorder",
    "ns_text_bigram_freq",
    "ns_text_repetition",
    "ns_text_simpson_diversity",
    "ns_udf_group_zscore",
    "op_b1_conjunctive_filter",
    "op_b2_filter_by_id",
    "op_b3_filter_by_routing",
    "op_b4_range_predicate",
    "op_b5_projection",
    "op_b6_prefix_scan",
    "op_c1_reconstruct_flat",
    "op_c3_has_child_range",
    "op_c4_has_parent",
    "op_c5_edges",
    "op_d1_hit_count",
    "op_f1_key_synthesis",
    "op_f2_content_hash",
    "op_f3_date_validation",
    "ts_dedup_first",
    "ts_enriched_by_segment",
    "ts_funnel",
    "ts_gap_filled_minutes",
    "ts_hypertable_rollup",
    "ts_markov_transitions",
    "ts_period_over_period",
    "ts_point_in_time_join",
    "ts_retention_cohort",
    # --- 15 oldest-r9 rows, alphabetical ---
    "ext_agg_groupby",
    "ext_asof_join",
    "ext_skew_profile",
    "ns_ann_ivf",
    "ns_dataset_diff",
    "ns_decontaminate",
    "ns_dedup_embedding_cosine",
    "ns_dedup_embedding_topk",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_simhash",
    "ns_embed_centroids",
    "ns_embed_dim_stats",
    "ns_embed_outliers",
    "ns_mixture_weights",
    "ns_multimodal_decode",
    # --- the 7 bk64-touched queries (displaced r9-tail back-fill) ---
    "ns_corpus_curation",
    "ns_dedup_cluster_stats",
    "ns_dedup_components",
    "ns_dedup_incremental",
    "ns_dedup_lsh_bucket_audit",
    "ns_dedup_lsh_pair_recall",
    "ns_dedup_minhash_lsh",
)

# ROUND-14 ROTATION PLAN: regenerate docs/ROTATION_LEDGER.md from
# CORRECTNESS_r13 FIRST, then fill in this priority order:
#   1. the ~34 remaining r9-stale rows (trust the REGENERATED ledger,
#      never this comment);
#   2. the remaining slots from oldest-r10 alphabetical;
#   3. any query whose implementation changes during round 14 displaces
#      from the TAIL of the r10 block (never an r9 row).
# After r14 no green row should be older than r10.

def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R13 else name


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
