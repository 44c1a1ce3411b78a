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


def test_ilog2_q4_cross_engine_and_bounds(spark, duck):
    """ilog2_q4 must be bit-identical to its DuckDB mirror across nibble
    boundaries, the y^4 truncation threshold, and up to 2^63-1, and stay
    within one quarter-bit step (plus ~2^-14 truncation) of true 4*log2."""
    import math

    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.functions.exact import DUCK_ILOG2_Q4, ilog2_q4

    vals = [1, 2, 3, 15, 16, 17, 32767, 32768, 32769, 55107, 55108, 55109,
            10**6, 10**12, 10**15, 2**52 - 1, 2**53, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long").select(
        "x", ilog2_q4(F.col("x")).alias("q")
    )
    got = {r.x: r.q for r in df.collect()}
    want = dict(
        duck.execute(
            f"SELECT x, {DUCK_ILOG2_Q4.format(col='x')} FROM (SELECT unnest({vals}) AS x)"
        ).fetchall()
    )
    assert got == want
    for v in vals:
        assert abs(got[v] - 4 * math.log2(v)) <= 1 + 4 * v * 2**-14 / max(v, 1), v


def test_bigram_surprisal_matches_python_reference(spark):
    """Replay the quarter-bit surprisal in Python on a handful of docs."""
    from collections import Counter

    from adv_big_data_indexing_spark.contract import registry
    from tests.conftest import SF_CORRECTNESS

    rows = registry()["ns_text_bigram_surprisal"].fn(spark, SF_CORRECTNESS).collect()
    got = {r.doc_id: (r.n_bigrams, r.surprisal_q4_sum) for r in rows}

    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    occ = []
    for d in docs:
        toks = d.text.split()
        occ += [(d.doc_id, toks[i], (toks[i], toks[i + 1])) for i in range(len(toks) - 1)]
    cf = Counter(o[1] for o in occ)
    cb = Counter(o[2] for o in occ)

    def ilog(x: int) -> int:
        s = max(x.bit_length() - 15, 0)
        y = x >> s
        return 4 * s + (y * y * y * y).bit_length() - 1

    for d in docs[:40]:
        toks = d.text.split()
        pairs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        if not pairs:
            assert d.doc_id not in got
            continue
        want_sum = sum(ilog(cf[a]) - ilog(cb[(a, b)]) for a, b in pairs)
        assert got[d.doc_id] == (len(pairs), want_sum), d.doc_id


def test_doc_chunking_invariants(spark):
    """Chunks cover every token, overlap by exactly W-S (except the final
    short chunk), and the stride-prefixes reassemble the document."""
    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.operators.text import CHUNK_S, CHUNK_W
    from tests.conftest import SF_CORRECTNESS

    rows = registry()["ns_doc_chunking"].fn(spark, SF_CORRECTNESS).collect()
    docs = {
        d.doc_id: d.text.split()
        for d in spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, t in docs.items() if t}
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.chunk_start == c.chunk_idx * CHUNK_S
            want = toks[c.chunk_start : c.chunk_start + CHUNK_W]
            assert c.chunk_text.split() == want and c.n_chunk_tokens == len(want)
        # every token covered; stride-prefixes reassemble the document
        reassembled = []
        for c in chunks:
            reassembled += c.chunk_text.split()[:CHUNK_S]
        tail = chunks[-1].chunk_text.split()[CHUNK_S:]
        assert reassembled + tail == toks


def test_collocations_pmi_reference(spark):
    """PMI top-k replayed in pure Python: same counts, same quarter-bit
    log terms, same (pmi DESC, bigram) order."""
    from collections import Counter

    from adv_big_data_indexing_spark.operators.text import PMI_MIN_COUNT, PMI_TOP_K

    rows = registry()["ns_text_collocations_pmi"].fn(spark, SF_CORRECTNESS).collect()

    def q4(x: int) -> int:
        s = max(x.bit_length() - 15, 0)
        y = x >> s
        return 4 * s + (y * y * y * y).bit_length() - 1

    uni: Counter = Counter()
    bi: Counter = Counter()
    for (text,) in (
        spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").select("text").collect()
    ):
        toks = [w for w in text.split() if w]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nb = sum(bi.values())
    scored = [
        (f"{a} {b}", c, uni[a], uni[b], q4(c) + q4(nb) - q4(uni[a]) - q4(uni[b]))
        for (a, b), c in bi.items()
        if c >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[4], t[0]))
    want = scored[:PMI_TOP_K]
    got = [(r.bigram, r.cab, r.ca, r.cb, r.pmi_q4) for r in rows]
    assert got == want
