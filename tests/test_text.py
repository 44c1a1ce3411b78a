"""Text-quality operators: repetition signals + embedding centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.operators.text import _grams
from adv_big_data_indexing_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS


def test_repetition_bounds_on_corpus(spark):
    rows = registry()["ns_text_repetition"].fn(spark, SF_CORRECTNESS).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0.0 <= r.dup_tri_frac <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert r.n_tri_distinct <= r.n_tri


def test_repetition_flags_synthetic_spam(spark):
    docs = spark.createDataFrame(
        [
            (1, "buy now " * 50),  # template spam: one bigram dominates
            (2, "the quick brown fox jumps over a lazy dog near riverbank"),
            (3, "ab"),  # too short for any trigram
        ],
        "doc_id long, text string",
    ).select("doc_id", F.trim("text").alias("text"))
    from adv_big_data_indexing_spark.functions.text import tokens

    t = docs.select("doc_id", tokens("text").alias("toks"))
    tri = t.select("doc_id", F.explode(_grams(F.col("toks"), 3)).alias("g"))
    stats = {
        r.doc_id: (r.n, r.nd)
        for r in tri.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.countDistinct("g").alias("nd"))
        .collect()
    }
    n, nd = stats[1]
    assert nd <= 3 and n == 98  # spam doc: ~everything repeats
    n2, nd2 = stats[2]
    assert n2 == nd2  # natural sentence: no repeated trigram
    assert 3 not in stats  # 2 tokens -> zero trigrams emitted


def test_centroid_counts_match_label_sizes(spark):
    got = registry()["ns_embed_centroids"].fn(spark, SF_CORRECTNESS)
    n_by_label = {
        r.label: r.n for r in got.filter(F.col("pos") == 0).collect()
    }
    exp = dict(
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .groupBy("label")
        .count()
        .collect()
    )
    assert n_by_label == exp
    # every label has exactly 64 dims
    dims = got.groupBy("label").count().collect()
    assert all(r["count"] == 64 for r in dims)
