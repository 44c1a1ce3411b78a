"""Regenerate docs/PLANS.md: formatted physical plans for representative
operators, with the scale property each plan demonstrates.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.session import get_spark

SHOWCASE = [
    (
        "op_a1_point_lookup",
        "Point lookup: the key predicate reaches the parquet scan "
        "(PushedFilters) — at 100 TB only matching row groups are read.",
    ),
    (
        "op_c2_has_child_eq",
        "has_child search: LeftSemi + BroadcastHashJoin — parents stream "
        "once, the filtered child keys broadcast; no fan-out, no dedup.",
    ),
    (
        "ext_join_broadcast_star",
        "Star join: both dimensions broadcast, the fact table never "
        "shuffles for the join; aggregation is partial map-side.",
    ),
    (
        "ext_agg_groupby",
        "Q1-shape aggregate: partial_sum before the exchange — only the "
        "tiny grouped state crosses the network.",
    ),
    (
        "ext_topk_orderby",
        "Global top-k: TakeOrderedAndProject (per-partition heaps), no "
        "range-partitioned full sort.",
    ),
    (
        "ext_asof_join",
        "As-of join composition: one shuffle on the key, one window pass — "
        "no inequality-join nested loop anywhere.",
    ),
    (
        "ns_dedup_minhash_lsh",
        "MinHash-LSH: one corpus scan end-to-end — one md5 per shingle, "
        "16 affine minhashes as a single wide min-aggregate, band bucketing, "
        "and the exact-overlap verify over hash sets carried with the "
        "signatures; no join anywhere in the plan.",
    ),
    (
        "ext_tpch_q3_shape",
        "TPC-H Q3 shape: TakeOrderedAndProject top-k (no global sort), "
        "both dimensions broadcast, date/segment filters pushed to every "
        "scan.",
    ),
    (
        "ext_bloom_semijoin",
        "Bloom semi-join reduction: the 8 KB packed bitmap broadcasts; "
        "each fact row probes with O(1) element_at + bit mask before any "
        "shuffle — the explicit runtime-filter pattern.",
    ),
    (
        "doc_roundtrip_flat",
        "Shred∘reconstruct identity: the whole document pipeline plans as "
        "joins + hash aggregates over the source scans — no Python anywhere.",
    ),
    (
        "ext_join_tpch_q5",
        "Six-table star join (TPC-H Q5 shape): dims ride BroadcastHashJoins, "
        "the date + region predicates push into the scans, and the only big "
        "shuffle is lineitem⋈orders — the plan that survives 1000 executors.",
    ),
    (
        "ns_dedup_incremental",
        "Incremental dedup: the arriving batch's LSH bands BROADCAST into "
        "the corpus band index — work scales with batch size, not corpus "
        "size; exact-Jaccard verify only touches candidate pairs.",
    ),
    (
        "ns_layout_zorder",
        "Z-order layout key: pure bitwise expressions inside "
        "WholeStageCodegen + a partial hash aggregate — the write-side "
        "clustering pass costs one scan.",
    ),
    (
        "ext_skew_salted_join",
        "Salted hot-key join: SortMergeJoin on (key, salt) — the 16× "
        "dim replication spreads each of the 5 hot keys over 16 "
        "reducers; no broadcast, so the salt does real work, and the "
        "result is provably identical to the unsalted join (the oracle "
        "is the unsalted join).",
    ),
    (
        "ns_mixture_weights",
        "Domain-mixture rebalancing: two tiny broadcast joins feed a "
        "map-only integer hash gate; the only shuffles are the "
        "per-language count and the final 5-row summary — the fact "
        "scan itself never reshuffles.",
    ),
    (
        "ns_ann_topk_bruteforce",
        "Exact ANN rescoring, single-pass form: the 10-vector query "
        "panel broadcasts as numpy; ONE Arrow-batched scan stage computes "
        "the exact int64 dot matrix and keeps each batch's top-k in the "
        "global total order, so the final window ranks k*batches rows — "
        "no crossJoin, no checkpoint, no repartition of the candidates.",
    ),
    (
        "ns_corpus_shuffle",
        "Training-order shuffle (r7 grouped_row_number): shard is a hash "
        "bucket, pos the per-shard rank reassembled from broadcast "
        "per-(partition, shard) offsets over ONE range exchange — no "
        "global sort AND no corpus/N_SHARDS-rows-in-one-task window at "
        "any scale.",
    ),
    (
        "ext_window_ntile",
        "Per-group exact ntile for LOW-cardinality groups (r7 "
        "grouped_ntile): range partition by (segment, balance, key), "
        "local ranks from monotonically_increasing_id, per-(partition, "
        "segment) stats broadcast back, fill rule in int64 — no "
        "one-task-per-segment WindowExec.",
    ),
    (
        "ext_tpch_q2_shape",
        "TPC-H Q2 (min-cost supplier): ONE checkpointed derived-partsupp "
        "pass feeds both the per-part min and the winner join, every "
        "dimension broadcasts, and the acctbal top-100 is an ordered "
        "take — the full 22-pattern TPC-H suite ships as of r7.",
    ),
    (
        "ns_quality_curriculum",
        "Exact quantile bins: the corpus aggregates to an integer-score "
        "histogram (map-side partial), the cumulative window runs on that "
        "tiny frame, and the decile map broadcasts back — exact deciles "
        "without ntile over a global sort.",
    ),
    (
        "ns_text_bigram_surprisal",
        "Corpus-statistics surprisal: one token explode feeds three "
        "map-side-combined aggregates; the quarter-bit integer log2 runs "
        "on the distinct-gram tables only, and the per-doc join is a "
        "partitioned hash join that never touches raw text.",
    ),
    (
        "ts_interval_join",
        "Stream-stream interval join (batch twin): equi-join on user_id "
        "with the time band as a residual filter — one shuffle, no "
        "BroadcastNestedLoopJoin; the streaming form bounds the same "
        "state with watermarks.",
    ),
    (
        "ts_anomaly_zscore",
        "Rolling anomaly detection: one shuffle on user_id, one Window "
        "over the trailing frame with exact integer state (quantized "
        "sum / sum-of-squares), z computed in whole-stage codegen — "
        "variance parity across engines without a single "
        "order-dependent float sum.",
    ),
    (
        "ns_bm25_topk",
        "BM25 ranked retrieval: per-row tf expressions (no token explode "
        "anywhere — zero Generate nodes), corpus stats reduce to ONE "
        "broadcast scalar row, quarter-bit integer idf + scaled-integer "
        "tf saturation in codegen, and top-k via TakeOrderedAndProject.",
    ),
    (
        "ns_dedup_span_coverage",
        "Exact-substring duplication coverage: position-indexed span "
        "hashes from one posexplode, the dup-gram set via an O(1)-state "
        "min!=max aggregate (full map-side combine), a keyed join back, "
        "and a doc-partitioned interval-union window — O(tokens) + "
        "O(dup occurrences) at any corpus size.",
    ),
    (
        "ns_graph_pagerank",
        "PageRank, aggregate-then-iterate: the q5-shaped join tree "
        "collapses map-side into a checkpointed |nations|^2 edge list; "
        "each damped iteration is a keyed join + partial-agg groupBy in "
        "exact fixed-point int64 — the loop that runs unchanged when the "
        "graph is a billion nodes and each step is one shuffle.",
    ),
    (
        "ns_assoc_rules",
        "Market-basket rules: ONE shuffle builds per-basket item arrays "
        "(collect_set folds the dedup in), candidate pairs explode "
        "MAP-SIDE from the sorted arrays — no SortMergeJoin in the plan "
        "— and both count dimensions broadcast; top-k by lift is a "
        "TakeOrderedAndProject, never a global pair sort.",
    ),
    (
        "ext_auc_exact",
        "Exact ROC-AUC via rank-sum: no join at all — one scan, a "
        "global rank window (range-partitioned at real scale) and one "
        "aggregate; the O(pos*neg) pairwise comparison never exists, "
        "and integer doubled-average-ranks make ties bit-exact.",
    ),
    (
        "ext_tpch_q21_shape",
        "Q21 as pure aggregate: both correlated quantifiers (EXISTS + "
        "NOT EXISTS) collapse into one per-order groupBy — the plan has "
        "NO join at all, two keyed partial-agg shuffles, and a "
        "TakeOrderedAndProject; the textbook semi/anti formulation "
        "measured 6.8x slower at sf1.",
    ),
    (
        "ns_hybrid_rrf_fusion",
        "Hybrid RRF retrieval: the BM25 side keeps its zero-explode "
        "per-row tf plan, the dense side broadcasts one query vector, "
        "both rank windows run on pool-sized frames, and the fusion is "
        "a FULL OUTER join of two 100-row rank lists — O(pool) work "
        "after the two rankers.",
    ),
    (
        "ns_graph_bfs_hops",
        "Layered BFS (Pregel superstep as DataFrames): each hop is one "
        "keyed join frontier->edges plus a distinct and an anti-join "
        "against the visited union — work per layer is frontier-adjacent "
        "edges, loop state is a checkpointed frontier, and the same loop "
        "runs on a billion-edge graph one shuffle per layer.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-dump")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()
    out = [
        "# Physical plans (generated by tools/dump_plans.py — do not edit)",
        "",
        f"Source: `{sf_dir}`. Each section shows `explain(formatted)` for a",
        "representative operator and the scale property the plan proves.",
        "",
    ]
    for name, why in SHOWCASE:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", why, "", "```", buf.getvalue().rstrip(), "```", ""]
    Path("docs").mkdir(exist_ok=True)
    Path("docs/PLANS.md").write_text("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
