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


def test_quality_curriculum_long_doc_no_int32_wrap(spark, tmp_path):
    """ADVICE r4 (medium): 1e6 * size(filter(...)) must be int64 BEFORE the
    multiply — size() is INT and a doc with >=2148 stopword tokens wraps
    int32 under non-ANSI Spark, silently diverging from the oracle's
    int64 arithmetic. Synthetic 3000-stopword doc forces the wrap path."""
    import duckdb

    from adv_big_data_indexing_spark.contract import registry
    from tests.parity import compare

    docs = [
        (1, " ".join(["the"] * 3000), "en", "synthetic", 3999),  # all stopwords
        (2, "quick brown fox jumps over dogs", "en", "synthetic", 31),
        (3, "the quick fox", "en", "synthetic", 13),
    ]
    pdf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{pdf_dir}/documents.parquet")

    spec = registry()["ns_quality_curriculum"]
    got = spec.fn(spark, pdf_dir)
    assert {r.doc_id: r.score_q for r in got.collect()}[1] == 1_000_000

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pdf_dir}/documents.parquet/*.parquet'"
    )
    assert compare(spec.fn(spark, pdf_dir), con.sql(spec.oracle)) == []
    con.close()


def test_doc_chunking_whitespace_only_doc(spark, tmp_path):
    """ADVICE r4 (low): chunk count is clamped so a zero/whitespace-only
    text emits exactly ONE empty chunk (tokens('') == ['']), matching the
    oracle's `i*S < len(toks)` bound — never the descending-sequence
    two-bogus-chunks shape."""
    import duckdb

    from adv_big_data_indexing_spark.contract import registry
    from tests.parity import compare

    docs = [
        (1, "", "en", "synthetic", 0),
        (2, "   ", "en", "synthetic", 3),
        (3, "alpha beta gamma", "en", "synthetic", 16),
    ]
    pdf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{pdf_dir}/documents.parquet")

    spec = registry()["ns_doc_chunking"]
    rows = spec.fn(spark, pdf_dir).collect()
    per_doc = {d: [r for r in rows if r.doc_id == d] for d in (1, 2, 3)}
    assert len(per_doc[1]) == 1 and per_doc[1][0].chunk_text == ""
    assert len(per_doc[2]) == 1 and per_doc[2][0].chunk_text == ""
    assert len(per_doc[3]) == 1 and per_doc[3][0].chunk_text == "alpha beta gamma"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pdf_dir}/documents.parquet/*.parquet'"
    )
    assert compare(spec.fn(spark, pdf_dir), con.sql(spec.oracle)) == []
    con.close()


def test_near_dup_edges_routes_to_lsh_above_cap(spark):
    """VERDICT r7 item 6 fallout: the exact inverted-index jaccard
    self-join writes shuffle quadratic in duplicate-group size (ENOSPC
    at sf10's ~4800-doc clique groups), so above MAX_EXACT_JACCARD_DOCS
    the components/cluster-stats pair source must substitute the
    minhash-LSH verified candidates; at calibration sizes it must stay
    the oracle-exact pair set."""
    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.operators.dedup import near_dup_edges

    # default route at the test SF: identical to the exact-jaccard op
    exact = {
        (r.doc_a, r.doc_b)
        for r in registry()["ns_dedup_ngram_jaccard"]
        .fn(spark, SF_CORRECTNESS)
        .select("doc_a", "doc_b")
        .collect()
    }
    default = {
        (r.doc_a, r.doc_b)
        for r in near_dup_edges(spark, SF_CORRECTNESS).collect()
    }
    assert default == exact

    # forced big-corpus route: identical to the LSH op's verified pairs
    lsh = {
        (r.doc_a, r.doc_b)
        for r in registry()["ns_dedup_minhash_lsh"]
        .fn(spark, SF_CORRECTNESS)
        .select("doc_a", "doc_b")
        .collect()
    }
    routed = {
        (r.doc_a, r.doc_b)
        for r in near_dup_edges(spark, SF_CORRECTNESS, exact_cap=0).collect()
    }
    assert routed == lsh
    # LSH candidates are exact-verified at the same threshold: the routed
    # set can only miss pairs (banding recall), never invent them
    assert routed <= exact


def test_exact_jaccard_guard_refuses_with_routing_hint():
    import pytest

    from adv_big_data_indexing_spark.operators.dedup import (
        MAX_EXACT_JACCARD_DOCS,
        _guard_exact_jaccard,
    )

    _guard_exact_jaccard(MAX_EXACT_JACCARD_DOCS, "x")  # at cap: allowed
    with pytest.raises(ValueError, match="ns_dedup_minhash_lsh"):
        _guard_exact_jaccard(MAX_EXACT_JACCARD_DOCS + 1, "ns_dedup_ngram_jaccard")


def test_ngram_jaccard_query_surface_routes_above_cap(spark):
    """VERDICT r8 item 7: the ns_dedup_ngram_jaccard QUERY surface (not
    just the internal near_dup_edges) must be usable at 100 TB — above
    the corpus cap it returns the LSH pipeline's exact-threshold-verified
    pairs with the SAME 4-column schema; exact_only=True restores the
    refuse-loudly guard."""
    import pytest

    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        ns_dedup_ngram_jaccard,
    )

    spec = registry()["ns_dedup_ngram_jaccard"]
    exact_df = spec.fn(spark, SF_CORRECTNESS)  # below cap: exact path
    exact = {(r.doc_a, r.doc_b) for r in exact_df.collect()}

    routed_df = ns_dedup_ngram_jaccard(spark, SF_CORRECTNESS, exact_cap=0)
    assert routed_df.columns == exact_df.columns == [
        "doc_a", "doc_b", "n_inter", "jaccard"
    ]
    routed = routed_df.collect()
    assert all(r.jaccard >= JACCARD_THRESHOLD for r in routed)
    routed_pairs_set = {(r.doc_a, r.doc_b) for r in routed}
    # LSH candidates are exact-verified: can miss (recall), never invent
    assert routed_pairs_set <= exact
    lsh = {
        (r.doc_a, r.doc_b)
        for r in registry()["ns_dedup_minhash_lsh"]
        .fn(spark, SF_CORRECTNESS)
        .select("doc_a", "doc_b")
        .collect()
    }
    assert routed_pairs_set == lsh

    with pytest.raises(ValueError, match="ns_dedup_minhash_lsh"):
        ns_dedup_ngram_jaccard(
            spark, SF_CORRECTNESS, exact_only=True, exact_cap=0
        ).collect()


def test_cc_driver_fold_matches_star_loop(spark, monkeypatch):
    """r14 (VERDICT r13 item 4): below MAX_DRIVER_CC_EDGES the closure
    folds onto the driver (union-find); the emitted (node, component_id)
    row set must be IDENTICAL to the distributed large-star/small-star
    loop (cap forced to -1), including the converged-star convention of
    omitting each component's min node."""
    from adv_big_data_indexing_spark.operators import graph as G

    pairs = (
        [(i, i + 1) for i in range(1, 9)]  # chain (diameter stress)
        + [(20, 21), (22, 21), (23, 22), (20, 23)]  # cycle
        + [(40, 41)]  # pair
        + [(50, 50), (41, 40)]  # self-loop + duplicate orientation
    )
    e = spark.createDataFrame(pairs, "a long, b long")
    driver = {(r.node, r.component_id) for r in G.connected_components(e).collect()}
    monkeypatch.setattr(G, "MAX_DRIVER_CC_EDGES", -1)
    dist = {(r.node, r.component_id) for r in G.connected_components(e).collect()}
    assert driver == dist
    assert (2, 1) in driver and (23, 20) in driver and (41, 40) in driver
    assert not any(n == c for n, c in driver)  # min node itself omitted
