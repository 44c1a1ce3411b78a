"""Connected components (large-star/small-star) + deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from adv_big_data_indexing_spark.operators.graph import connected_components
from adv_big_data_indexing_spark.operators.sampling import (
    split_assign,
    stratified_sample,
)
from adv_big_data_indexing_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS


def _cc(spark, pairs):
    e = spark.createDataFrame(pairs, "a long, b long")
    return {
        (r.node, r.component_id) for r in connected_components(e).collect()
    }


def test_cc_chain_collapses_to_min(spark):
    # a 7-node chain: diameter-6, the case naive propagation needs 6
    # rounds for; star-contraction closes it fast and exactly
    got = _cc(spark, [(i, i + 1) for i in range(1, 7)])
    assert got == {(i, 1) for i in range(2, 8)}


def test_cc_two_components_and_orientation_invariance(spark):
    pairs = [(5, 3), (3, 9), (20, 21), (21, 20), (21, 22)]
    got = _cc(spark, pairs)
    assert got == {(5, 3), (9, 3), (21, 20), (22, 20)}


def test_cc_self_loops_and_duplicates_ignored(spark):
    got = _cc(spark, [(4, 4), (4, 2), (2, 4), (4, 2)])
    assert got == {(4, 2)}


def test_split_is_stable_and_partition_independent(spark):
    d = load_table(spark, SF_CORRECTNESS, "documents")
    one = {(r.doc_id, r.split) for r in split_assign(d).collect()}
    # same corpus, different physical layout → identical assignment
    two = {
        (r.doc_id, r.split)
        for r in split_assign(d.repartition(17, "lang")).collect()
    }
    assert one == two
    frac = sum(1 for _, s in one if s == "train") / len(one)
    assert 0.8 < frac < 0.97  # ~90% ± hash noise at n=500


def test_stratified_sample_downsamples_dominant_stratum(spark):
    d = load_table(spark, SF_CORRECTNESS, "documents")
    before = dict(d.groupBy("lang").count().collect())
    after = dict(stratified_sample(d).groupBy("lang").count().collect())
    # en keeps ~25%, others ~50%: the dominant stratum's keep-rate is lower
    en_rate = after["en"] / before["en"]
    other_rate = sum(v for k, v in after.items() if k != "en") / sum(
        v for k, v in before.items() if k != "en"
    )
    assert en_rate < other_rate
    # gate is a subset filter: every kept row existed
    assert all(after[k] <= before[k] for k in after)


def test_components_refine_pair_dedup(spark):
    """Every near-dup pair must land in one component; canonical docs
    are exactly the component minima."""
    from adv_big_data_indexing_spark.contract import registry

    r = registry()
    comp = {
        row.doc_id: row.component_id
        for row in r["ns_dedup_components"].fn(spark, SF_CORRECTNESS).collect()
    }
    pairs = r["ns_dedup_ngram_jaccard"].fn(spark, SF_CORRECTNESS).collect()
    assert pairs, "corpus should contain near-dup pairs"
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b]
    # component id is the minimum member
    members: dict = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    for c, ms in members.items():
        assert c == min(ms)


def test_decontaminate_consistent_with_near_dup_pairs(spark):
    """A contaminated (eval, train) doc pair sharing 73+ 8-grams must also
    be a near-dup pair — and both flagged docs must sit in the eval split."""
    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.operators.sampling import (
        EVAL_LT,
        TRAIN_LT,
        split_assign,
    )

    r = registry()
    hits = r["ns_decontaminate"].fn(spark, SF_CORRECTNESS).collect()
    assert len(hits) > 0
    d = load_table(spark, SF_CORRECTNESS, "documents").select("doc_id")
    splits = {row.doc_id: row.split for row in split_assign(d).collect()}
    dup_docs = set()
    for p in r["ns_dedup_ngram_jaccard"].fn(spark, SF_CORRECTNESS).collect():
        dup_docs |= {p.doc_a, p.doc_b}
    for h in hits:
        assert splits[h.eval_doc_id] == "eval"
        assert h.eval_doc_id in dup_docs  # heavy overlap ⇒ near-dup doc
        assert h.n_shared_grams >= h.n_train_docs


def test_corpus_shuffle_is_dense_total_order(spark):
    """Every doc appears exactly once; within each shard pos is dense
    1..n; the order is deterministic across independent evaluations."""
    from adv_big_data_indexing_spark.contract import registry
    from tests.conftest import SF_CORRECTNESS

    fn = registry()["ns_corpus_shuffle"].fn
    rows = fn(spark, SF_CORRECTNESS).collect()
    n_docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(16))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # determinism: a second independent evaluation yields the same order
    again = {(r.doc_id): (r.shard, r.pos) for r in fn(spark, SF_CORRECTNESS).collect()}
    assert {(r.doc_id): (r.shard, r.pos) for r in rows} == again


def test_quality_curriculum_deciles_monotone_and_complete(spark):
    """Deciles are 1..10, monotone in score, tie-coherent (equal scores
    share a decile), and by-value bucket sizes respect ceil(10*cum/N)."""
    from adv_big_data_indexing_spark.contract import registry
    from tests.conftest import SF_CORRECTNESS

    rows = registry()["ns_quality_curriculum"].fn(spark, SF_CORRECTNESS).collect()
    assert all(1 <= r.decile <= 10 for r in rows)
    by_score: dict[int, set[int]] = {}
    for r in rows:
        by_score.setdefault(r.score_q, set()).add(r.decile)
    # tie-coherent: one decile per score value
    assert all(len(d) == 1 for d in by_score.values())
    # monotone: higher score never lands in a lower decile
    scored = sorted((s, next(iter(d))) for s, d in by_score.items())
    assert all(a[1] <= b[1] for a, b in zip(scored, scored[1:]))
    # ceil(10*cum/N) law replayed in Python
    n = len(rows)
    cum = 0
    from collections import Counter

    counts = Counter(r.score_q for r in rows)
    for s, c in sorted(counts.items()):
        cum += c
        want = -(-10 * cum // n)  # ceil
        assert by_score[s] == {want}, (s, by_score[s], want)
