"""Deterministic sampling / splitting for training-data pipelines.

Train/eval/holdout splits and per-stratum downsampling must be
STABLE: re-running the pipeline on the same corpus (or an appended
corpus) must assign each document to the same split, regardless of
partitioning, row order, or cluster size. ``df.sample()`` /
``sampleBy()`` are seeded per-partition and reshuffle-sensitive, so
they fail that bar. The portable construction: hash the stable key
(md5 — identical in every engine), take the first byte as a bucket
in [0, 256), compare against per-split / per-stratum thresholds.

At 100 TB this is embarrassingly parallel — a map-only projection,
no shuffle, prunes to the key + stratum columns.

The reference has no sampling layer (north-star scope; its nearest
analog is the `size: 1000` full-scan cap, src/utils/elasticSearch.ts:209).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.functions.text import DUCK_BASE48, DUCK_HEX_NIBBLE, hex_nibble
from adv_big_data_indexing_spark.sources.catalog import load_table

#: split thresholds on the 0..255 bucket: ~90% train, ~5% eval, ~5% holdout
TRAIN_LT = 230
EVAL_LT = 243


def hash_bucket(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 256): first md5 byte of salt:key."""
    h = F.md5(F.concat_ws(":", F.lit(salt), key.cast("string")))
    return (
        hex_nibble(F.substring(h, 1, 1)) * 16 + hex_nibble(F.substring(h, 2, 1))
    ).cast("int")


def duck_hash_bucket(key_sql: str, salt: str = "split") -> str:
    h = f"md5('{salt}:' || CAST({key_sql} AS VARCHAR))"
    n1 = DUCK_HEX_NIBBLE.format(ch=f"substr({h}, 1, 1)")
    n2 = DUCK_HEX_NIBBLE.format(ch=f"substr({h}, 2, 1)")
    return f"CAST({n1} * 16 + {n2} AS INTEGER)"


def split_assign(df: DataFrame, key: str = "doc_id") -> DataFrame:
    b = hash_bucket(F.col(key))
    return df.withColumn("split_bucket", b).withColumn(
        "split",
        F.when(b < TRAIN_LT, F.lit("train"))
        .when(b < EVAL_LT, F.lit("eval"))
        .otherwise(F.lit("holdout")),
    )


@query(
    "ns_split_train_eval",
    oracle=f"""
    SELECT doc_id,
           {duck_hash_bucket("doc_id")} AS split_bucket,
           CASE WHEN {duck_hash_bucket("doc_id")} < {TRAIN_LT} THEN 'train'
                WHEN {duck_hash_bucket("doc_id")} < {EVAL_LT} THEN 'eval'
                ELSE 'holdout' END AS split
    FROM documents
    """,
    doc="NS deterministic train/eval/holdout split (~90/5/5) keyed on "
    "md5(doc_id) — stable across reruns, row order, and corpus appends; "
    "shuffle-free map-only projection.",
)
def ns_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return split_assign(d).select("doc_id", "split_bucket", "split")


#: per-language keep-rate numerators over 256 (downsample dominant 'en')
STRATUM_KEEP = {"en": 64, "de": 128, "fr": 128, "es": 128, "zh": 128}
DEFAULT_KEEP = 192


def stratified_sample(
    df: DataFrame, stratum_col: str = "lang", key: str = "doc_id"
) -> DataFrame:
    """Keep each row iff its hash bucket clears the stratum's threshold —
    a deterministic `sampleBy` (per-language rebalance: downsample the
    dominant language, keep more of the rare ones)."""
    b = hash_bucket(F.col(key), salt="strat")
    keep = F.lit(DEFAULT_KEEP)
    for lang, n in STRATUM_KEEP.items():
        keep = F.when(F.col(stratum_col) == lang, F.lit(n)).otherwise(keep)
    return df.filter(b < keep)


@query(
    "ns_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_kept
    FROM (
      SELECT lang FROM documents
      WHERE {duck_hash_bucket("doc_id", salt="strat")} <
            CASE lang WHEN 'en' THEN {STRATUM_KEEP["en"]}
                      WHEN 'de' THEN {STRATUM_KEEP["de"]}
                      WHEN 'fr' THEN {STRATUM_KEEP["fr"]}
                      WHEN 'es' THEN {STRATUM_KEEP["es"]}
                      WHEN 'zh' THEN {STRATUM_KEEP["zh"]}
                      ELSE {DEFAULT_KEEP} END
    )
    GROUP BY lang
    """,
    doc="NS deterministic stratified downsample by language (hash-gated "
    "sampleBy analog) summarized as kept-count per stratum; the gate is "
    "a pushdown-able scan predicate — no shuffle until the summary agg.",
)
def ns_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(d)
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_kept"))
    )


# --- Weighted (Poisson) sampling ------------------------------------------

#: inclusion probability = n_chars / W_SCALE (docs at/above W_SCALE chars
#: are always kept) — longer documents sampled proportionally more often.
W_SCALE = 4000


@query(
    "ns_weighted_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             {DUCK_BASE48.format(sh="'wsamp:' || CAST(doc_id AS VARCHAR)")} AS u48
      FROM documents
    )
    SELECT doc_id, lang, n_chars
    FROM h
    WHERE u48 * {W_SCALE} < n_chars * {1 << 48}
    """,
    doc="NS deterministic weighted (Poisson) sampling: each document is "
    f"kept with probability n_chars/{W_SCALE} — inclusion proportional to "
    "length — decided by comparing a 48-bit md5 hash of the doc id "
    "against the weight, ALL IN EXACT INTEGERS (u48*W < w*2^48, bounded "
    "well under 2^63), so the sample is identical in any engine and on "
    "any rerun. The weighted complement to the uniform split and the "
    "per-stratum gate: quality- or length-aware corpus downsampling "
    "where the gate is a pushdown-able scan predicate — no shuffle, no "
    "state, no RNG.",
)
def ns_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from adv_big_data_indexing_spark.functions.text import base_hash48

    d = load_table(spark, sf_dir, "documents")
    u48 = base_hash48(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
    return (
        d.withColumn("u48", u48)
        .filter(F.col("u48") * W_SCALE < F.col("n_chars") * F.lit(1 << 48))
        .select("doc_id", "lang", "n_chars")
    )


# --- Domain-mixture rebalancing --------------------------------------------


@query(
    "ns_mixture_weights",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    m AS (SELECT min(n_docs) AS n_min FROM counts),
    gated AS (
      SELECT d.lang, c.n_docs, m.n_min,
             CASE WHEN {duck_hash_bucket("d.doc_id", salt="mix")} * c.n_docs
                       < m.n_min * 256
                  THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN counts c USING (lang) CROSS JOIN m
    )
    SELECT lang, n_docs,
           CAST(n_min * 1000000 // n_docs AS BIGINT) AS rate_ppm,
           CAST(sum(keep) AS BIGINT) AS n_kept
    FROM gated GROUP BY lang, n_docs, n_min
    """,
    doc="NS domain-mixture rebalancing: compute per-language acceptance "
    "rates that downsample every language to the rarest one's share "
    "(uniform target mixture), then apply them with the same hash gate "
    "as the stratified sampler — deterministic, rerun-stable, and exact: "
    "the gate is the integer cross-multiply bucket*n_lang < n_min*256, "
    "never a float rate. This is the 'data mixing' step before "
    "pretraining: per-group counts (one tiny aggregate broadcast back) "
    "followed by a map-only gated scan; at 100 TB the counts come from "
    "table statistics and the gate is a pushed-down predicate.",
)
def ns_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    gated = (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(n_min))
        .withColumn(
            "keep",
            (
                hash_bucket(F.col("doc_id"), salt="mix") * F.col("n_docs")
                < F.col("n_min") * 256
            ).cast("int"),
        )
    )
    return gated.groupBy("lang", "n_docs", "n_min").agg(
        F.sum("keep").cast("bigint").alias("n_kept")
    ).select(
        "lang",
        "n_docs",
        F.expr("n_min * 1000000 DIV n_docs").alias("rate_ppm"),
        "n_kept",
    )


# --- Exact-size uniform sample (deterministic reservoir analog) ------------

RESERVOIR_K = 100


@query(
    "ns_reservoir_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               ORDER BY md5('res:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= {RESERVOIR_K}
    """,
    doc="NS exact-size uniform sample: the deterministic reservoir-sampling "
    f"analog — global top-{RESERVOIR_K} by md5(doc_id), so the sample has "
    "an EXACT row count (rate-based hash gates only hit the target in "
    "expectation), is uniform over the corpus, and is rerun-stable. "
    "Spark executes it as TakeOrderedAndProject: per-partition top-k "
    "then a k-row merge on the driver — no global sort, no RNG state; "
    "the same plan at 100 TB moves only n_partitions*k rows.",
)
def ns_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "lang", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(RESERVOIR_K)
        .select("doc_id", "lang")
    )
