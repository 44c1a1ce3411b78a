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
# Round 9 window (regenerated docs/ROTATION_LEDGER.md from CORRECTNESS_r08
# FIRST — the r8 window comment over-claimed "ALL 26 r3-stale rows" when 31
# existed; the VERDICT r8 residual #1 lists the 5 ts_* rows displaced by
# mid-round impl changes). Priority order per VERDICT r8 item 2:
#   1. ALL 5 remaining r3-stale rows (the displaced ts_* set);
#   2. ALL 39 remaining r4-stale rows (includes the 4 the r8 plan comment
#      named: ext_agg_groupby, ext_asof_join, ext_skew_profile, ns_ann_ivf);
#   3. 6 oldest-r5 alphabetical rows as back-fill — these are the
#      displacement budget: any query whose implementation changes during
#      round 9 replaces an r5 back-fill row (never an r3/r4 row).
# After this round no green row is older than r5.
_DRIVER_WINDOW_R9 = (
    # --- all 5 remaining r3-stale rows (displaced from the r8 window) ---
    "ts_rolling_range_frame",
    "ts_scd2_history",
    "ts_sliding_window",
    "ts_time_weighted_avg",
    "ts_user_stats",
    # --- all 39 remaining r4-stale rows ---
    "ext_agg_groupby",
    "ext_asof_join",
    "ext_skew_profile",
    "ns_ann_ivf",
    "ns_dataset_diff",
    "ns_decontaminate",
    "ns_dedup_embedding_cosine",
    "ns_dedup_embedding_topk",
    "ns_embed_centroids",
    "ns_embed_dim_stats",
    "ns_embed_outliers",
    "ns_mixture_weights",
    "ns_multimodal_decode",
    "ns_multimodal_metadata",
    "ns_pack_sequences",
    "ns_pack_stats",
    "ns_phrase_search",
    "ns_pii_mask",
    "ns_reservoir_sample",
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
    "ts_session_window",
    "ts_tumbling_window",
    # --- implementation changed during round 9 (displaces r5 back-fill) ---
    "ns_dedup_simhash",  # degenerate chunk buckets now ROUTE via self-join,
    #                      never drop (ADVICE r9 medium — the old
    #                      BUCKET_PAIR_CAP drop lost the sf10 clique's pairs)
    "ns_dedup_ngram_jaccard",  # query surface now routes above the cap
    #                      instead of refusing (VERDICT r8 item 7); below
    #                      the cap (every driver SF) the plan is unchanged
    "ns_semdedup_kmeans",  # blocked within-cluster pairwise kernel (r9
    #                      degenerate-cluster probe, VERDICT r8 item 4)
    "ns_semdedup_prune",  # same blocked kernel, greedy min-id rule
    "ns_negative_sampling",  # DISK_ONLY checkpoint blocks for the edge
    #                      frame (r9 sf10 find #5: the MEMORY_AND_DISK
    #                      unroll starved the distinct's own hash-agg)
    "ext_fuzzy_join_levenshtein",  # PassJoin segment-pigeonhole rewrite
    #                      (r9 sf10 sweep find #6: fixed-cardinality
    #                      blocks made the old self-join n²/1250)
    # (the 6 planned r5 back-fill slots were all displaced by mid-round
    #  impl changes — ext_ab_wilson_ci and the other oldest-r5 rows lead
    #  the r10 back-fill instead)
)

# ROUND-10 ROTATION PLAN: regenerate the ledger after CORRECTNESS_r09
# lands, then fill in this priority order:
#   1. the _lsh_pair_stats consumers whose shared helper changed LATE
#      in r9 (route-never-drop: degenerate buckets now expand through
#      the self-join tier instead of being excluded — results
#      bit-identical at every calibration SF, max bucket 3/4/40 at
#      sf0.01/0.1/1 vs the removed 4096 cap; local oracle parity green)
#      but could not displace into the full r9 window (its 44 r3/r4
#      rows are displacement-protected): ns_dedup_minhash_lsh,
#      ns_dedup_incremental, ns_dedup_lsh_pair_recall,
#      ns_dedup_components, ns_dedup_cluster_stats, ns_corpus_curation,
#      plus ns_dedup_lsh_bucket_audit (doc-only, same family);
#   2. the oldest r5 rows — all six planned r5 back-fills were
#      displaced by mid-r9 impl changes: ext_ab_wilson_ci,
#      ext_benford_audit, ext_chi2_contingency, ext_column_stats,
#      ext_dq_expectations, ext_k_anonymity_audit — they lead;
#   3. then oldest r6. Verify displacement math against the
#      REGENERATED ledger, never this comment (r8 lesson).

def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R9 else name


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
