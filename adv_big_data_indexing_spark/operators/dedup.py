"""Deduplication operators over ``documents``/``embeddings`` (north-star set).

Five dedup families, all expression-only (no Python UDFs):

- exact (hash groupBy)
- exact n-gram Jaccard (shingle inverted-index join — the ground truth)
- MinHash + LSH banding (candidate generation by band join, then exact
  verify restricted to candidates — the 100 TB path: work is
  O(sum shingles) + O(candidates), never O(n²))
- SimHash (64-bit signatures, 16-bit chunk banding; pigeonhole makes
  chunk-candidates exhaustive for hamming ≤ 3, so results are exact)
- embedding-cosine near-dup (exact integer-quantized cosine; the ANN
  module provides the bucketed scale path)

Determinism: every hash is md5-derived (portable), every count is
integer, and the single jaccard/cosine double division is IEEE
correctly-rounded — so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.functions.exact import DUCK_QUANTIZE, int_dot, quantize_vec
from adv_big_data_indexing_spark.functions.text import (
    DUCK_MINHASH,
    DUCK_SHINGLES3,
    DUCK_TOKENS,
    minhash_hex,
    shingles_from_tokens,
    tokens,
)
from adv_big_data_indexing_spark.sources.catalog import load_table

JACCARD_THRESHOLD = 0.8
N_MINHASH = 16
N_BANDS = 4  # rows per band = 4

def duck_shingle_cte(src: str = "documents") -> str:
    """toks/sh/sh_count CTE bodies over any (doc_id, text) source."""
    return f"""
  toks AS (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS t FROM {src}),
  sh AS (SELECT doc_id, unnest({DUCK_SHINGLES3.format(toks="t")}) AS sh FROM toks),
  sh_count AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""


_DUCK_SHINGLE_CTE = duck_shingle_cte()


def shingles_of(d: DataFrame) -> DataFrame:
    """(doc_id, sh) distinct word-3-gram shingles of a documents frame."""
    # The test parquet is a single row-group; without a repartition the
    # 50×-expansion (shingle explode × minhash seeds) runs in ONE task.
    # On a real multi-file table this is a no-op cost (tiny pre-explode rows).
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    toked = d.select("doc_id", tokens("text").alias("toks"))
    return toked.select("doc_id", F.explode(shingles_from_tokens(F.col("toks"))).alias("sh"))


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingles_of(load_table(spark, sf_dir, "documents"))


def _jaccard_pairs(sh: DataFrame, pair_filter: DataFrame | None = None) -> DataFrame:
    """Exact jaccard for doc pairs sharing ≥1 shingle (optionally restricted
    to a candidate pair set — the LSH verify path)."""
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    if pair_filter is not None:
        # Candidate-driven: the (small) pair set probes each side's shingles,
        # so work is O(|candidates| × shingles/doc), never the full
        # inverted-index self-join.
        joined = (
            F.broadcast(pair_filter)
            .join(a, "doc_a")
            .join(b, ["doc_b", "sh"])
        )
    else:
        joined = a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b"))
    inter = joined.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


@query(
    "ns_dedup_exact",
    oracle="""
    SELECT doc_id, md5(text) AS text_hash,
           (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
    FROM documents
    """,
    doc="NS exact dedup: content-hash grouping, keep the smallest doc_id per "
    "hash. At scale: one shuffle on the hash; the hash itself computes map-side.",
)
def ns_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.md5("text").alias("text_hash"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


@query(
    "ns_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sh_count na ON inter.doc_a = na.doc_id
    JOIN sh_count nb ON inter.doc_b = nb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
    """,
    doc="NS exact n-gram Jaccard near-dup pairs (word 3-gram shingles, "
    "inverted-index self-join). Only docs sharing a shingle ever pair up — "
    "no cross join. Skew note: at 100 TB drop stop-shingles (document "
    "frequency cap) before the self-join.",
)
def ns_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_df(spark, sf_dir)
    return _jaccard_pairs(sh).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


def _band_df(sh: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): the LSH banding of 16 md5-minhashes into
    4 bands × 4 rows. band_key folds the band's minhashes in seed order."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(N_MINHASH - 1))).alias("seed")
    mh = (
        sh.select("doc_id", "sh", seeds)
        .groupBy("doc_id", "seed")
        .agg(F.min(minhash_hex(F.col("sh"), F.col("seed"))).alias("mh"))
    )
    rows_per_band = N_MINHASH // N_BANDS
    return (
        mh.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda x: x.mh),
                ",",
            ).alias("band_key")
        )
    )


@query(
    "ns_dedup_minhash_lsh",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    mh AS (
      SELECT doc_id, seed, min({DUCK_MINHASH.format(seed="seed", shingle="sh")}) AS mh
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS seed)
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // {N_MINHASH // N_BANDS} AS band,
             string_agg(mh, ',' ORDER BY seed) AS band_key
      FROM mh GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
      GROUP BY 1, 2
    )
    SELECT inter.doc_a, inter.doc_b, n_inter,
           CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sh_count na ON inter.doc_a = na.doc_id
    JOIN sh_count nb ON inter.doc_b = nb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
    """,
    bench=True,
    doc="NS MinHash+LSH dedup: 16 md5-minhashes, 4 bands × 4 rows; candidates "
    "= docs sharing a band key; exact-Jaccard verify restricted to candidates. "
    "The scale path: signature build is one pass + one groupBy; the band join "
    "touches only colliding docs.",
)
def ns_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_df(spark, sf_dir)
    bands = _band_df(sh)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_pairs(sh, pair_filter=cand).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# --- SimHash ---------------------------------------------------------------

N_SIMHASH_BITS = 64
N_CHUNKS = 4  # 16 bits per chunk; pigeonhole-exhaustive for hamming <= 3
HAMMING_THRESHOLD = 3

_DUCK_SIMHASH_CTE = f"""
  toks AS (SELECT doc_id, unnest({DUCK_TOKENS.format(col="text")}) AS tok FROM documents),
  tf AS (SELECT doc_id, tok, count(*) AS cnt, md5(tok) AS h FROM toks GROUP BY 1, 2),
  bits AS (
    SELECT doc_id, b,
           CASE WHEN sum(cnt * (2 * (((strpos('0123456789abcdef', substr(h, b // 4 + 1, 1)) - 1) >> (3 - b % 4)) & 1) - 1)) >= 0
                THEN 1 ELSE 0 END AS bit
    FROM tf CROSS JOIN (SELECT unnest(generate_series(0, {N_SIMHASH_BITS - 1})) AS b)
    GROUP BY doc_id, b
  ),
  sig AS (
    SELECT doc_id, b // 16 AS chunk,
           CAST(sum(bit * (2 ** (15 - b % 16))) AS BIGINT) AS chunk_val
    FROM bits GROUP BY 1, 2
  )
"""


@query(
    "ns_dedup_simhash",
    oracle=f"""
    WITH {_DUCK_SIMHASH_CTE},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT cand.doc_a, cand.doc_b,
             CAST(sum(bit_count(xor(sa.chunk_val, sb.chunk_val))) AS BIGINT) AS hamming
      FROM cand
      JOIN sig sa ON sa.doc_id = cand.doc_a
      JOIN sig sb ON sb.doc_id = cand.doc_b AND sb.chunk = sa.chunk
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= {HAMMING_THRESHOLD}
    """,
    doc="NS SimHash near-dup: 64-bit md5-derived signatures (token-frequency "
    "weighted), banded into 4×16-bit chunks. A pair at hamming ≤ 3 must share "
    "≥1 chunk (pigeonhole), so the chunk join finds every qualifying pair — "
    "exact results with O(collisions) work, not O(n²).",
)
def ns_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    from adv_big_data_indexing_spark.functions.text import tokens

    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.md5("tok"))
    )
    # One wide aggregate instead of a 64× row explosion: 64 partial-sum
    # columns (bit b of md5(tok) contributes ±cnt), combined map-side —
    # the shuffle carries one 64-column row per doc, not 64 rows.
    # Nibbles project once (16 substr) so the 64 bit exprs are cheap shifts.
    nibbled = tf.selectExpr(
        "doc_id",
        "cnt",
        *[
            f"instr('0123456789abcdef', substr(h, {i + 1}, 1)) - 1 AS n{i}"
            for i in range(N_SIMHASH_BITS // 4)
        ],
    )
    bit_sums = nibbled.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(f"cnt * (2 * (shiftright(n{b // 4}, {3 - b % 4}) & 1) - 1)")
            ).alias(f"s{b}")
            for b in range(N_SIMHASH_BITS)
        ]
    )
    chunk_cols = []
    for chunk in range(N_CHUNKS):
        terms = [
            f"(CASE WHEN s{chunk * 16 + j} >= 0 THEN 1 ELSE 0 END) * {1 << (15 - j)}"
            for j in range(16)
        ]
        chunk_cols.append(f"CAST({' + '.join(terms)} AS BIGINT) AS c{chunk}")
    wide = bit_sums.selectExpr("doc_id", *chunk_cols)
    sig = wide.selectExpr(
        "doc_id",
        f"stack({N_CHUNKS}, "
        + ", ".join(f"{k}, c{k}" for k in range(N_CHUNKS))
        + ") AS (chunk, chunk_val)",
    )
    a_sig = sig.select(F.col("doc_id").alias("doc_a"), "chunk", "chunk_val")
    b_sig = sig.select(F.col("doc_id").alias("doc_b"), "chunk", "chunk_val")
    cand = (
        a_sig.join(b_sig, ["chunk", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), "chunk", F.col("chunk_val").alias("va"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), "chunk", F.col("chunk_val").alias("vb"))
    ham = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "chunk"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.bit_count(F.col("va").bitwiseXOR(F.col("vb")))).cast("bigint").alias("hamming"))
    )
    return ham.filter(F.col("hamming") <= HAMMING_THRESHOLD)


# --- Embedding near-dup ----------------------------------------------------

COSINE_DUP_THRESHOLD = 0.98

_DUCK_QVEC_CTE = f"""
  qv AS (SELECT vec_id, {DUCK_QUANTIZE.format(col="embedding")} AS q FROM embeddings),
  nrm AS (
    SELECT vec_id, q,
           CAST(list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * q[i])) AS BIGINT) AS n2
    FROM qv
  )
"""


@query(
    "ns_dedup_embedding_cosine",
    oracle=f"""
    WITH {_DUCK_QVEC_CTE},
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
             a.n2 AS na, b.n2 AS nb
      FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)) AS cosine
    FROM pairs
    WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)) >= {COSINE_DUP_THRESHOLD}
    """,
    doc="NS embedding-cosine near-dup pairs (exact, integer-quantized). "
    "All-pairs is intentional at oracle scale; the 100 TB path is the "
    "LSH-bucketed variant in operators/similarity.py which prunes to "
    "bucket-colliding pairs.",
)
def ns_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized backend: the candidate matrix broadcasts once, each
    Arrow batch of vectors does one exact int64 matmul against it
    (numpy @ on int64 is exact, and the double cosine formula uses the
    same correctly-rounded op order as the SQL oracle — parity holds
    bit-for-bit). ~10× the per-pair zip_with expression form. Brute
    force stays O(n²) by definition; this op is the exact baseline,
    the LSH variant is the scale path.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism).select(
        "vec_id", quantize_vec(F.col("embedding")).alias("q")
    )
    rows = e.collect()  # candidate side: small enough to broadcast (else → LSH op)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.q for r in rows], dtype=np.int64)
    n2 = (mat.astype(np.int64) * mat).sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, n2))

    def gen(batches):
        b_ids, b_mat, b_n2 = bc.value
        b_sqrt = np.sqrt(b_n2.astype(np.float64))
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["q"]), dtype=np.int64)
            a_n2 = (a_mat * a_mat).sum(axis=1)
            dot = a_mat @ b_mat.T  # exact int64
            cos = (dot.astype(np.float64) / np.sqrt(a_n2.astype(np.float64))[:, None]) / b_sqrt[None, :]
            ai, bi = np.nonzero((cos >= COSINE_DUP_THRESHOLD) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": a_ids[ai], "vec_b": b_ids[bi], "cosine": cos[ai, bi]}
            )

    return e.mapInPandas(gen, schema="vec_a long, vec_b long, cosine double")


# --- Incremental dedup (new batch vs existing index) -----------------------

_JAC = "CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter)"


@query(
    "ns_dedup_incremental",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    mh AS (
      SELECT doc_id, seed, min({DUCK_MINHASH.format(seed="seed", shingle="sh")}) AS mh
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS seed)
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // {N_MINHASH // N_BANDS} AS band,
             string_agg(mh, ',' ORDER BY seed) AS band_key
      FROM mh GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS doc_a, e.doc_id AS doc_b
      FROM bands n JOIN bands e
        ON n.band = e.band AND n.band_key = e.band_key
      WHERE n.doc_id % 10 = 0 AND e.doc_id % 10 <> 0
    ),
    inter AS (
      SELECT cand.doc_a, cand.doc_b, count(*) AS n_inter
      FROM cand
      JOIN sh a ON a.doc_id = cand.doc_a
      JOIN sh b ON b.doc_id = cand.doc_b AND b.sh = a.sh
      GROUP BY 1, 2
    )
    SELECT inter.doc_a AS new_doc_id, inter.doc_b AS dup_of, n_inter,
           {_JAC} AS jaccard
    FROM inter
    JOIN sh_count na ON inter.doc_a = na.doc_id
    JOIN sh_count nb ON inter.doc_b = nb.doc_id
    WHERE {_JAC} >= {JACCARD_THRESHOLD}
    """,
    doc="NS incremental dedup: probe an arriving batch (doc_id % 10 = 0 "
    "stands in for 'today's crawl') against the EXISTING corpus via the "
    "LSH band index — the production shape where you never re-pair the "
    "whole corpus. The new side's bands broadcast into the index join; "
    "work scales with batch size + collisions, not corpus size. Exact "
    "Jaccard verify restricted to candidates, same contract as the "
    "full-corpus operator.",
)
def ns_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_df(spark, sf_dir)
    is_new = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    bands = _band_df(sh)
    n = bands.filter(is_new).select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    e = bands.filter(~is_new).select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cand = (
        F.broadcast(n)
        .join(e, ["band", "band_key"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    out = _jaccard_pairs(sh, pair_filter=cand).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    return out.select(
        F.col("doc_a").alias("new_doc_id"),
        F.col("doc_b").alias("dup_of"),
        "n_inter",
        "jaccard",
    )
