"""Similarity search over the ``embeddings`` table (north-star set).

Brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH-bucketed variant as the 100 TB path: signatures
build in one pass (broadcast of an 8×64 hyperplane table), then
candidate generation is an equi-join on the bucket key instead of a
cross join.

Determinism: embeddings are integer-quantized (functions/exact.py), dot
products and norms are exact BIGINTs, hyperplane weights derive from md5
(portable), and the final cosine is two correctly-rounded double ops —
so the DuckDB oracle reproduces every bit, including tie-free ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.operators.advanced import (
    consistent_materialize,
)
from adv_big_data_indexing_spark.functions.exact import DUCK_QUANTIZE, int_dot_fixed, quantize_vec
from adv_big_data_indexing_spark.functions.text import DUCK_BASE48
from adv_big_data_indexing_spark.sources.catalog import load_table

TOP_K = 5
N_QUERIES = 10  # query set = vec_id < 10
N_HYPERPLANES = 8
DIM = 64
WEIGHT_MOD = 2001  # weights in [-1000, 1000]

#: hard cap on the brute-force candidate (scan) side. Exact rescoring over
#: every vector is the anti-pattern at 100 TB; past this size the operator
#: refuses and routes to the LSH/IVF candidate generators. The per-query
#: cost is candidates × DIM multiplies, so 2^20 candidates ≈ 67M int ops
#: per query — the practical ceiling for an "exact baseline" stage.
MAX_BRUTEFORCE_CANDIDATES = 1 << 20

_DUCK_NRM_CTE = f"""
  qv AS (SELECT vec_id, {DUCK_QUANTIZE.format(col="embedding")} AS q FROM embeddings),
  nrm AS (
    SELECT vec_id, q,
           CAST(list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * q[i])) AS BIGINT) AS n2
    FROM qv
  )
"""

_COSINE = "CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE))"


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # single-row-group input → spread the O(n·k) vector math across cores
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    e = e.select("vec_id", quantize_vec(F.col("embedding")).alias("q"))
    return e.withColumn("n2", int_dot_fixed(F.col("q"), F.col("q"), DIM))


def _ranked_topk(pairs: DataFrame) -> DataFrame:
    """pairs(query_id, neighbor_id, dot, na, nb) -> top-k by exact cosine."""
    cosine = (
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double"))
        / F.sqrt(F.col("nb").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _guard_bruteforce(n_candidates: int, op_name: str) -> None:
    """Shared fail-fast routing guard for the exact O(n·q) rankers."""
    if n_candidates > MAX_BRUTEFORCE_CANDIDATES:
        raise ValueError(
            f"{op_name} scans all {n_candidates} vectors per query "
            f"(cap {MAX_BRUTEFORCE_CANDIDATES}); use ns_ann_lsh_bucketed or "
            f"ns_ann_ivf for candidate pruning at this scale — "
            f"ns_ann_lsh_recall quantifies the recall trade."
        )


def _bruteforce_topk(e: DataFrame, op_name: str = "ns_ann_topk_bruteforce") -> DataFrame:
    """Exact top-k from an already-quantized (vec_id, q, n2) frame.

    Callers must pass an already-checkpointed frame: the cap guard's
    ``count()`` is an extra action, and on an un-checkpointed input it
    would re-execute the whole quantization pipeline.
    """
    n_candidates = e.count()
    _guard_bruteforce(n_candidates, op_name)
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("na")
        )
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("q").alias("nq"), F.col("n2").alias("nb"))
    pairs = q.crossJoin(n).filter(F.col("neighbor_id") != F.col("query_id"))
    pairs = pairs.select(
        "query_id", "neighbor_id", int_dot_fixed(F.col("qq"), F.col("nq"), DIM).alias("dot"), "na", "nb"
    )
    out = _ranked_topk(pairs)
    return out.select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))


@query(
    "ns_ann_topk_bruteforce",
    oracle=f"""
    WITH {_DUCK_NRM_CTE},
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
             a.n2 AS na, b.n2 AS nb
      FROM nrm a JOIN nrm b ON b.vec_id != a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT query_id, neighbor_id, {_COSINE} AS cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY {_COSINE} DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM scored WHERE rank <= {TOP_K}
    """,
    bench=True,
    doc="NS brute-force cosine top-k (k=5) for 10 query vectors. The query side "
    "broadcasts; candidates stream partition-local, then a per-query top-k window. "
    "At 100 TB this is the exact-rescoring stage; candidate pruning is the LSH op. "
    "Guarded: refuses above MAX_BRUTEFORCE_CANDIDATES and routes to LSH/IVF "
    "(ns_ann_lsh_recall measures what that routing costs in recall).",
)
def ns_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Arrow/numpy form of the exact rescoring stage.

    The query panel (N_QUERIES vectors) is collected, quantized in numpy
    (same floor(x·1e6) as quantize_vec — float32→float64 widening and the
    double multiply are exact/correctly-rounded in both paths) and
    broadcast; one mapInPandas pass over the candidates then computes the
    exact int64 dot matrix per Arrow batch and keeps each batch's local
    top-k per query in the GLOBAL total order (-cosine, neighbor_id), so
    the final window ranks ≤ k·batches rows instead of all pairs. Exact
    same output as the crossJoin+window form (`_bruteforce_topk`, still
    the shape the recall contract shares with the LSH path): cosine is
    (dot/sqrt(na))/sqrt(nb) — identical IEEE op order. Replaces 5 stages
    (repartition, checkpoint, crossJoin, partial topk, window) with 2.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    raw = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # metadata-only count (parquet footer): the same routing guard as
    # _bruteforce_topk without touching the data pages
    n_candidates = raw.count()
    _guard_bruteforce(n_candidates, "ns_ann_topk_bruteforce")

    def _npq(vecs) -> "np.ndarray":  # numpy twin of quantize_vec
        return np.floor(
            np.array(list(vecs), dtype=np.float64) * 1_000_000.0
        ).astype(np.int64)

    q_rows = raw.filter(F.col("vec_id") < N_QUERIES).collect()
    if not q_rows:
        # empty query panel: _npq would be 1-D and .sum(axis=1) would
        # crash — return the empty result with the contract schema
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = _npq(r.embedding for r in q_rows)
    q_n2 = (q_mat * q_mat).sum(axis=1)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_n2))

    def gen(batches):
        # use ONLY the broadcast values inside the task — referencing the
        # driver-scope q_mat/q_ids/q_n2 here would capture them in every
        # task closure and defeat the broadcast
        b_ids, b_mat, b_n2 = bc.value
        a_sqrt = np.sqrt(b_n2.astype(np.float64))
        for pdf in batches:
            if not len(pdf):
                continue  # empty Arrow batch: np.array(list(...)) is 1-D
            n_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            n_mat = _npq(pdf["embedding"])
            n_n2 = (n_mat * n_mat).sum(axis=1)
            dot = b_mat @ n_mat.T  # exact int64
            cos = (
                dot.astype(np.float64) / a_sqrt[:, None]
            ) / np.sqrt(n_n2.astype(np.float64))[None, :]
            out = {"query_id": [], "neighbor_id": [], "cosine": []}
            for qi in range(len(b_ids)):
                c = cos[qi]
                mask = n_ids != b_ids[qi]
                idx = np.nonzero(mask)[0]
                # local top-k in the global total order (-cosine, neighbor_id)
                # so per-batch truncation can never drop a global top-k row.
                # NaN cosines (zero-quantized vectors) sort LARGEST to match
                # Spark/DuckDB double ordering — numpy lexsort puts NaN last,
                # which would silently drop rows the final window ranks #1
                key = np.where(np.isnan(c[idx]), -np.inf, -c[idx])
                order = idx[np.lexsort((n_ids[idx], key))[:TOP_K]]
                out["query_id"].extend([b_ids[qi]] * len(order))
                out["neighbor_id"].extend(n_ids[order])
                out["cosine"].extend(c[order])
            yield pd.DataFrame(out)

    local = raw.mapInPandas(gen, schema="query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


# --- LSH-bucketed variant --------------------------------------------------

# Hyperplane weight w[j][i] (j hyperplane, i dim 1-based): parse the first 12
# hex chars of md5('hp:j:i') as an integer, then center mod WEIGHT_MOD.
# Both engines compute it from md5, so the planes agree bit-for-bit.
#: shared 48-bit md5 parse (functions/text.DUCK_BASE48) seeded per weight
_DUCK_B48_HP = DUCK_BASE48.format(sh="'hp:' || j || ':' || i")

_DUCK_HYPERPLANES_CTE = f"""
  hp AS (
    SELECT j, i,
           {_DUCK_B48_HP} % {WEIGHT_MOD} - {WEIGHT_MOD // 2} AS w
    FROM (SELECT unnest(generate_series(0, {N_HYPERPLANES - 1})) AS j)
         CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
  ),
  buckets AS (
    SELECT v.vec_id,
           string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
    FROM (
      SELECT qv.vec_id, hp.j, sum(hp.w * qv.q[hp.i]) AS s
      FROM qv CROSS JOIN hp GROUP BY 1, 2
    ) v GROUP BY v.vec_id
  )
"""


def _hyperplanes(spark: SparkSession) -> DataFrame:
    """(j, i, w) hyperplane weights — tiny, broadcast everywhere."""
    js = spark.range(N_HYPERPLANES).select(F.col("id").cast("int").alias("j"))
    exploded = js.select("j", F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"))
    from adv_big_data_indexing_spark.functions.text import base_hash48  # noqa: PLC0415

    # weight = the shared 48-bit md5 parse (functions/text.base_hash48),
    # centered mod WEIGHT_MOD — one hex-parse implementation repo-wide
    seed = F.concat(F.lit("hp:"), F.col("j"), F.lit(":"), F.col("i"))
    return exploded.select(
        "j",
        "i",
        (base_hash48(seed) % WEIGHT_MOD - WEIGHT_MOD // 2).alias("w"),
    )


def _buckets(spark: SparkSession, e: DataFrame) -> DataFrame:
    hp = F.broadcast(_hyperplanes(spark))
    proj = (
        e.crossJoin(hp)
        .select("vec_id", "j", (F.col("w") * F.element_at(F.col("q"), F.col("i"))).alias("t"))
        .groupBy("vec_id", "j")
        .agg(F.sum("t").alias("s"))
    )
    return (
        proj.select(
            "vec_id", "j", F.when(F.col("s") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
        )
        .groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("j", "bit"))), lambda x: x.bit), ""
            ).alias("bucket")
        )
    )


def _lsh_topk(spark: SparkSession, e: DataFrame) -> DataFrame:
    """LSH-bucketed top-k from an already-quantized (vec_id, q, n2) frame."""
    buckets = _buckets(spark, e)
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    nb = buckets.select(F.col("vec_id").alias("neighbor_id"), "bucket")
    cand = qb.join(nb, "bucket").filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id"
    )
    a = e.select(F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("na"))
    b = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("nq"), F.col("n2").alias("nb")
    )
    pairs = (
        cand.join(a, "query_id")
        .join(b, "neighbor_id")
        .select(
            "query_id", "neighbor_id", int_dot_fixed(F.col("qq"), F.col("nq"), DIM).alias("dot"), "na", "nb"
        )
    )
    out = _ranked_topk(pairs)
    return out.select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))


@query(
    "ns_ann_lsh_bucketed",
    oracle=f"""
    WITH {_DUCK_NRM_CTE},
    {_DUCK_HYPERPLANES_CTE},
    cand AS (
      SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id
      FROM buckets qa JOIN buckets qb
        ON qa.bucket = qb.bucket AND qb.vec_id != qa.vec_id
      WHERE qa.vec_id < {N_QUERIES}
    ),
    pairs AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
             a.n2 AS na, b.n2 AS nb
      FROM cand c JOIN nrm a ON a.vec_id = c.query_id JOIN nrm b ON b.vec_id = c.neighbor_id
    ),
    scored AS (
      SELECT query_id, neighbor_id, {_COSINE} AS cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY {_COSINE} DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM scored WHERE rank <= {TOP_K}
    """,
    doc="NS LSH-bucketed ANN: 8 md5-derived random hyperplanes → 8-bit sign "
    "bucket; candidates share the query's bucket (equi-join, no cross join); "
    "exact integer cosine re-scores candidates. Approximate by design — the "
    "oracle replicates the same algorithm, so results still match exactly.",
)
def ns_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The quantized frame feeds three join sides (bucket build + both
    # rescore sides); checkpoint it once instead of re-executing the
    # quantization pipeline per side. At real scale this is the
    # "signatures table" any LSH index materializes anyway.
    return _lsh_topk(spark, _quantized(spark, sf_dir).transform(consistent_materialize))


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantizer → probe one cell → exact re-score
# ---------------------------------------------------------------------------



@query(
    "ns_ann_ivf",
    oracle=f"""
    WITH qv AS (SELECT vec_id, label, {DUCK_QUANTIZE.format(col="embedding")} AS q FROM embeddings),
    nrm AS (
      SELECT vec_id, label, q,
             CAST(list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * q[i])) AS BIGINT) AS n2
      FROM qv
    ),
    flat AS (
      SELECT label, i, CAST(sum(q[i]) AS BIGINT) AS s
      FROM qv CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label, list(s ORDER BY i) AS csum,
             (SELECT count(*) FROM qv v WHERE v.label = flat.label) AS n_members
      FROM flat GROUP BY label
    ),
    assign AS (
      SELECT a.vec_id AS query_id, a.q AS qq, a.n2 AS na, c.label AS probe_label,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY CAST(list_sum(list_transform(generate_series(1, {DIM}), i -> a.q[i] * c.csum[i])) AS DOUBLE) / c.n_members DESC,
                        c.label
             ) AS cr
      FROM nrm a CROSS JOIN cent c
      WHERE a.vec_id < {N_QUERIES}
    ),
    cand AS (
      SELECT s.query_id, s.qq, s.na, b.vec_id AS neighbor_id, b.q AS nq, b.n2 AS nb
      FROM (SELECT * FROM assign WHERE cr = 1) s
      JOIN nrm b ON b.label = s.probe_label AND b.vec_id != s.query_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(list_sum(list_transform(generate_series(1, {DIM}), i -> qq[i] * nq[i])) AS BIGINT) AS dot,
             na, nb
      FROM cand
    ),
    ranked AS (
      SELECT query_id, neighbor_id, {_COSINE} AS cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY {_COSINE} DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="NS IVF-style ANN: coarse cells = label groups with exact integer "
    "centroid sums; each query probes its nearest cell (by exact "
    "query·centroid score — integer dot / member count, deterministic "
    "label tie-break) and re-scores only that cell's members with exact "
    "cosine. The inverted-file pattern: candidate work is |cell|, not n; "
    "at 100 TB cells are partitions and the probe is partition pruning.",
)
def ns_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism).select(
        "vec_id", "label", quantize_vec(F.col("embedding")).alias("q")
    )
    # four consumers (centroid build, member counts, query side, cell
    # members) — checkpoint the quantized frame once; at real scale this
    # is the persisted IVF "codes" table
    e = e.withColumn("n2", int_dot_fixed(F.col("q"), F.col("q"), DIM)).transform(
        consistent_materialize
    )

    # exact integer centroid sums per cell: elementwise array sum via
    # posexplode + groupBy (one shuffle of n·d small rows)
    flat = e.select("label", F.posexplode("q").alias("i", "v"))
    cent_flat = flat.groupBy("label", "i").agg(F.sum("v").alias("s"))
    cent = (
        cent_flat.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))), lambda x: x.s
            ).alias("csum")
        )
        .join(e.groupBy("label").agg(F.count("*").alias("n_members")), "label")
    )

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("na")
    )
    scored_cells = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "qq",
        "na",
        F.col("label").alias("probe_label"),
        (int_dot_fixed(F.col("qq"), F.col("csum"), DIM).cast("double") / F.col("n_members")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("probe_label"))
    assign = scored_cells.withColumn("cr", F.row_number().over(w)).filter(F.col("cr") == 1)

    b = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("probe_label"),
        F.col("q").alias("nq"),
        F.col("n2").alias("nb"),
    )
    cand = assign.join(b, "probe_label").filter(F.col("neighbor_id") != F.col("query_id"))
    pairs = cand.select(
        "query_id", "neighbor_id", int_dot_fixed(F.col("qq"), F.col("nq"), DIM).alias("dot"), "na", "nb"
    )
    out = _ranked_topk(pairs)
    return out.select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))


@query(
    "ns_embed_centroids",
    oracle=f"""
    WITH qv AS (
      SELECT vec_id, label, {DUCK_QUANTIZE.format(col="embedding")} AS q
      FROM embeddings
    ),
    ex AS (
      SELECT label, i - 1 AS pos, q[i] AS v
      FROM qv CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    )
    SELECT label, pos,
           CAST(sum(v) AS BIGINT) AS s_quant,
           count(*) AS n,
           CAST(sum(v) AS DOUBLE) / 1000000.0 / count(*) AS centroid
    FROM ex GROUP BY 1, 2
    """,
    doc="NS per-label embedding centroids (k-means E-step / IVF coarse-"
    "quantizer training building block), exploded to (label, dim) rows. "
    "Sums are exact quantized BIGINTs — merge-order-free, so map-side "
    "partial aggregation is safe; the centroid double is two correctly-"
    "rounded ops on identical integers in both engines. At scale: one "
    "shuffle of (label, dim) partial sums, 64·|labels| rows total.",
)
def ns_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # same as the sibling posexplode ops: the single-row-group test
    # parquet would otherwise run the 64x explode+aggregate in one task
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    q = quantize_vec(F.col("embedding"))
    ex = e.select("label", F.posexplode(q).alias("pos", "v"))
    return ex.groupBy("label", "pos").agg(
        F.sum("v").alias("s_quant"),
        F.count("*").alias("n"),
        (F.sum("v").cast("double") / F.lit(1000000.0) / F.count("*")).alias("centroid"),
    )


@query(
    "ns_embed_dim_stats",
    oracle=f"""
    WITH qv AS (SELECT {DUCK_QUANTIZE.format(col="embedding")} AS q FROM embeddings),
    ex AS (
      SELECT i - 1 AS dim, q[i] AS v
      FROM qv CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
    )
    SELECT dim,
           count(*) AS n,
           CAST(sum(v) AS DOUBLE) / count(*) / 1000000 AS mean,
           (CAST(sum(v * v) AS DOUBLE) / count(*)
            - (CAST(sum(v) AS DOUBLE) / count(*)) * (CAST(sum(v) AS DOUBLE) / count(*)))
             / 1000000 / 1000000 AS variance
    FROM ex GROUP BY dim
    """,
    doc="NS per-dimension embedding statistics (the normalization table a "
    "feature pipeline computes before whitening/clipping): exact integer "
    "sums of quantized values per dimension, mean and population variance "
    "assembled with a fixed double op order — bit-identical cross-engine. "
    "One posexplode (n*d small rows) + one map-side-combined aggregate; "
    "at 100 TB this is the same shape as the centroid build, and the "
    "per-dimension state is just (n, sum, sum_sq).",
)
def ns_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism).select(
        quantize_vec(F.col("embedding")).alias("q")
    )
    ex = e.select(F.posexplode("q").alias("dim", "v"))
    g = ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("sq"),
    )
    mean_units = F.col("s").cast("double") / F.col("n")
    return g.select(
        "dim",
        "n",
        (mean_units / 1_000_000).alias("mean"),
        (
            (F.col("sq").cast("double") / F.col("n") - mean_units * mean_units)
            / 1_000_000
            / 1_000_000
        ).alias("variance"),
    )


# ---------------------------------------------------------------------------
# Recall contract: LSH candidates vs brute-force ground truth
# ---------------------------------------------------------------------------

_DUCK_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len(a.q)), "
    "i -> a.q[i] * b.q[i])) AS BIGINT)"
)


@query(
    "ns_ann_lsh_recall",
    oracle=f"""
    WITH {_DUCK_NRM_CTE},
    {_DUCK_HYPERPLANES_CTE},
    bf_pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_DOT} AS dot, a.n2 AS na, b.n2 AS nb
      FROM nrm a JOIN nrm b ON b.vec_id != a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_COSINE} DESC, neighbor_id) AS rank
        FROM bf_pairs
      ) WHERE rank <= {TOP_K}
    ),
    lsh_cand AS (
      SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id
      FROM buckets qa JOIN buckets qb
        ON qa.bucket = qb.bucket AND qb.vec_id != qa.vec_id
      WHERE qa.vec_id < {N_QUERIES}
    ),
    lsh_pairs AS (
      SELECT c.query_id, c.neighbor_id, {_DUCK_DOT} AS dot, a.n2 AS na, b.n2 AS nb
      FROM lsh_cand c
      JOIN nrm a ON a.vec_id = c.query_id
      JOIN nrm b ON b.vec_id = c.neighbor_id
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_COSINE} DESC, neighbor_id) AS rank
        FROM lsh_pairs
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.query_id,
           count(*) AS n_exact,
           count(l.neighbor_id) AS n_hit,
           CAST(count(l.neighbor_id) AS DOUBLE) / count(*) AS recall
    FROM bf LEFT JOIN lsh l
      ON l.query_id = bf.query_id AND l.neighbor_id = bf.neighbor_id
    GROUP BY 1
    """,
    doc="NS ANN recall contract: per-query recall of the LSH-bucketed top-k "
    "against the brute-force exact top-k — the measurement that justifies "
    "routing large corpora away from the guarded exact path (both result "
    "sets are deterministic, so even the recall fractions reproduce "
    "bit-for-bit in the oracle). At 100 TB this runs on a sampled query "
    "panel while production serves from the LSH/IVF route.",
)
def ns_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The LSH ranker's three join sides share one checkpointed
    # quantization pass; the exact ground truth comes from the single-pass
    # Arrow/numpy ranker (bit-identical to the crossJoin+window form
    # `_bruteforce_topk` — both are verified against the same oracle), so
    # the exact side costs one extra lightweight scan instead of a
    # crossJoin over the checkpoint (measured ~1.2 s → ~0.8 s at sf0.1).
    e = _quantized(spark, sf_dir).transform(consistent_materialize)
    exact = ns_ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = _lsh_topk(spark, e).select(
        F.col("query_id").alias("l_query_id"), F.col("neighbor_id").alias("l_neighbor_id")
    )
    joined = exact.join(
        approx,
        (F.col("query_id") == F.col("l_query_id"))
        & (F.col("neighbor_id") == F.col("l_neighbor_id")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.count("l_neighbor_id").alias("n_hit"),
        (F.count("l_neighbor_id").cast("double") / F.count("*")).alias("recall"),
    )


#: outliers reported by the centroid-distance QA scan
OUTLIER_TOP = 20


@query(
    "ns_embed_outliers",
    oracle=f"""
    WITH qv AS (SELECT vec_id, label, {DUCK_QUANTIZE.format(col="embedding")} AS q FROM embeddings),
    nrm AS (
      SELECT vec_id, label, q,
             CAST(list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * q[i])) AS BIGINT) AS n2
      FROM qv
    ),
    flat AS (
      SELECT label, i, CAST(sum(q[i]) AS BIGINT) AS s
      FROM qv CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label, list(s ORDER BY i) AS csum,
             CAST(list_sum(list_transform(generate_series(1, {DIM}),
                  i -> list(s ORDER BY i)[i] * list(s ORDER BY i)[i])) AS BIGINT) AS cn2
      FROM flat GROUP BY label
    ),
    scored AS (
      SELECT v.vec_id, v.label,
             CAST(list_sum(list_transform(generate_series(1, {DIM}), i -> v.q[i] * c.csum[i])) AS DOUBLE)
               / sqrt(CAST(v.n2 AS DOUBLE)) / sqrt(CAST(c.cn2 AS DOUBLE)) AS cos_to_centroid
      FROM nrm v JOIN cent c USING (label)
    )
    SELECT vec_id, label, cos_to_centroid,
           CAST(row_number() OVER (ORDER BY cos_to_centroid, vec_id) AS INTEGER) AS rank
    FROM scored
    ORDER BY cos_to_centroid, vec_id LIMIT {OUTLIER_TOP}
    """,
    doc="NS embedding outlier scan — the mislabeled-data QA check: cosine "
    "of every vector against its label's centroid (exact integer sums; "
    "cos(q, csum) == cos(q, csum/n), so no division enters until the "
    "final two correctly-rounded double ops), lowest-cosine top-k "
    "reported. One scan + a (label, dim) partial-sum shuffle + a "
    "broadcast of |labels| centroids + TakeOrderedAndProject — no "
    "global sort. Int64 bound: |csum_i| ≤ n_members·1e6, so the dot "
    "stays exact below ~1.4e5 members per label; larger cells would "
    "pre-divide the centroid (DuckDB errors loudly on overflow).",
)
def ns_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism).select(
        "vec_id", "label", quantize_vec(F.col("embedding")).alias("q")
    )
    e = e.withColumn("n2", int_dot_fixed(F.col("q"), F.col("q"), DIM)).transform(
        consistent_materialize
    )
    flat = e.select("label", F.posexplode("q").alias("i", "v"))
    cent = (
        flat.groupBy("label", "i")
        .agg(F.sum("v").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))), lambda x: x.s
            ).alias("csum")
        )
        .withColumn("cn2", int_dot_fixed(F.col("csum"), F.col("csum"), DIM))
    )
    scored = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        (
            int_dot_fixed(F.col("q"), F.col("csum"), DIM).cast("double")
            / F.sqrt(F.col("n2").cast("double"))
            / F.sqrt(F.col("cn2").cast("double"))
        ).alias("cos_to_centroid"),
    )
    top = scored.orderBy("cos_to_centroid", "vec_id").limit(OUTLIER_TOP)
    w = Window.orderBy("cos_to_centroid", "vec_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# Distributed PCA: Gram-matrix aggregation + exact integer power iteration
# ---------------------------------------------------------------------------

#: truncate the Gram matrix to |g| <= 2^32 before iterating; with
#: |v| <= ~2^21 after each rescale, a matvec stays under
#: 64 * 2^32 * 2^21 = 2^59 — comfortably inside int64 on both engines.
_PCA_GBITS = 1 << 32
#: eigenvector components rescaled to |v| <= ~2^20 per iteration.
_PCA_VSCALE = 1 << 20
#: the synthetic embeddings are near-isotropic (lambda2/lambda1 ~ 0.984),
#: so the Rayleigh quotient climbs at ~(lambda2/lambda1)^2 per step; 24
#: steps reach >= 0.985 * lambda_max on that spectrum (test-pinned). The
#: iteration runs on a D x D matrix — its cost is data-independent, so
#: the count is a quality knob, not a scale concern.
_PCA_ITERS = 24


def _tdiv(expr: str, den: str) -> str:
    """Truncating integer division with explicit sign handling — the form
    whose result is identical in DuckDB (`//` truncates), Spark (`div`
    truncates) and the driver-side Python replica below (which uses the
    same abs//sign decomposition, NOT Python's flooring `//`)."""
    return f"CASE WHEN {expr} < 0 THEN -((-({expr})) // {den}) ELSE ({expr}) // {den} END"


def _pca_oracle(iters: int = _PCA_ITERS) -> str:
    ctes = [
        f"q AS (SELECT {DUCK_QUANTIZE.format(col='embedding')} AS qv FROM embeddings)",
        f"dims AS (SELECT CAST(unnest(generate_series(1, {DIM})) AS BIGINT) AS j)",
        """gram AS MATERIALIZED (
      SELECT d1.j AS j, d2.j AS k, CAST(sum(qv[d1.j] * qv[d2.j]) AS BIGINT) AS g
      FROM q CROSS JOIN dims d1 CROSS JOIN dims d2
      GROUP BY 1, 2
    )""",
        f"gden AS (SELECT greatest(max(abs(g)) // {_PCA_GBITS}, 1) AS gd FROM gram)",
        f"gt AS MATERIALIZED (SELECT j, k, {_tdiv('g', 'gd')} AS g FROM gram CROSS JOIN gden)",
        f"v0 AS (SELECT j, CAST(1 AS BIGINT) AS v FROM dims)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""w{t} AS MATERIALIZED (
      SELECT gt.j AS j, CAST(sum(gt.g * v.v) AS BIGINT) AS w
      FROM gt JOIN v{t - 1} v ON v.j = gt.k GROUP BY 1
    )"""
        )
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT greatest(max(abs(w)) // {_PCA_VSCALE}, 1) AS d FROM w{t})"
        )
        ctes.append(
            f"v{t} AS MATERIALIZED (SELECT j, {_tdiv('w', 'd')} AS v FROM w{t} CROSS JOIN m{t})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(v.j AS INTEGER) AS dim, v.v AS loading, diag.g AS g_diag
    FROM v{iters} v
    JOIN (SELECT j, g FROM gram WHERE j = k) diag ON diag.j = v.j"""
    )


@query(
    "ns_embed_pca_power",
    bench=True,  # r12 headline-set refresh (VERDICT r11 item 2)
    oracle=_pca_oracle(),
    doc="NS distributed PCA, top principal direction: the D x D Gram "
    "matrix is aggregated in one distributed pass (per-Arrow-batch exact "
    "int64 numpy B^T B partials -> a 4096-key sum), then power iteration "
    "runs on the driver over the tiny D x D result — the standard "
    "split for covariance-family algorithms at 100 TB (data-sized work "
    "is one scan + one constant-size shuffle; iteration cost is "
    "O(D^2 T), data-independent). All arithmetic is integer-exact: "
    "quantized inputs, Gram truncated to 2^32, per-step rescale to "
    "2^20 with sign-explicit truncating division, so every engine (and "
    "the pure-Python driver loop) lands on identical int64s. Output: "
    "per-dim loading of the dominant eigenvector + exact per-dim "
    "second-moment diagonal.",
)
def ns_embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415

    raw = load_table(spark, sf_dir, "embeddings")
    # exactness guard: Gram entries are sums of N products bounded by
    # max|q|^2 ~ 2.8e11 at the 1e6 quantization scale, so int64 holds
    # them for N up to ~3.3e7 rows (metadata-only count). Beyond that,
    # re-quantize coarser (scale 1e3 -> N < 3.3e13) — overflow here is
    # SILENT wraparound in both numpy and the SQL oracle, so refuse
    # loudly instead.
    n_rows = raw.count()
    if n_rows > 30_000_000:
        raise ValueError(
            f"ns_embed_pca_power: {n_rows} rows would overflow int64 Gram "
            "sums at quantization scale 1e6; re-quantize at 1e3 for "
            "corpora past ~3e7 vectors."
        )
    e = raw.select(quantize_vec(F.col("embedding")).alias("q"))

    def gram_partials(batches):
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            b = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            g = b.T @ b  # exact: |q|<=2^20-ish, batch<=10k rows -> < 2^52
            jj, kk = np.meshgrid(np.arange(DIM), np.arange(DIM), indexing="ij")
            yield pd.DataFrame(
                {"j": jj.ravel() + 1, "k": kk.ravel() + 1, "g": g.ravel()}
            )

    gram_rows = (
        e.mapInPandas(gram_partials, schema="j int, k int, g long")
        .groupBy("j", "k")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    g = {(r.j, r.k): r.g for r in gram_rows}
    if not g:  # empty input: no principal direction, no rows (oracle agrees)
        return spark.createDataFrame([], schema="dim int, loading long, g_diag long")

    def tdiv(x: int, d: int) -> int:
        return -((-x) // d) if x < 0 else x // d

    gd = max(max(abs(v) for v in g.values()) // _PCA_GBITS, 1)
    gt = {jk: tdiv(v, gd) for jk, v in g.items()}
    v = [1] * DIM
    for _ in range(_PCA_ITERS):
        w = [sum(gt[(j + 1, k + 1)] * v[k] for k in range(DIM)) for j in range(DIM)]
        d = max(max(abs(x) for x in w) // _PCA_VSCALE, 1)
        v = [tdiv(x, d) for x in w]
    out = [(j + 1, v[j], g[(j + 1, j + 1)]) for j in range(DIM)]
    return spark.createDataFrame(out, schema="dim int, loading long, g_diag long")


# ---------------------------------------------------------------------------
# Matryoshka truncation report: energy retained per prefix length
# ---------------------------------------------------------------------------

MATRYOSHKA_LEVELS = (16, 32, 48)
_MAT_LOSSY_PPM = 900_000


@query(
    "ns_embed_matryoshka",
    oracle=f"""
    WITH q AS (
      SELECT {DUCK_QUANTIZE.format(col="embedding")} AS qv FROM embeddings
    ),
    e AS (
      SELECT CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS full_e, qv
      FROM q
    ),
    lev AS (
      SELECT unnest([{", ".join(str(lv) for lv in MATRYOSHKA_LEVELS)}]) AS level,
             full_e, qv
      FROM e WHERE full_e > 0
    ),
    r AS (
      SELECT level,
             (CAST(list_sum(list_transform(qv[1:level], x -> x * x)) AS BIGINT) // 64)
               * 1000000 // greatest(full_e // 64, 1) AS ret_ppm
      FROM lev
    )
    SELECT CAST(level AS INTEGER) AS level, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ret_ppm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_ret_ppm,
           CAST(min(ret_ppm) AS BIGINT) AS min_ret_ppm,
           CAST(max(ret_ppm) AS BIGINT) AS max_ret_ppm,
           CAST(sum(CASE WHEN ret_ppm < {_MAT_LOSSY_PPM} THEN 1 ELSE 0 END) AS BIGINT) AS n_lossy
    FROM r GROUP BY 1
    """,
    doc="NS Matryoshka truncation report (Kusupati et al. 2022): for each "
    f"prefix length {MATRYOSHKA_LEVELS}, the fraction of each vector's "
    "energy retained by keeping only the first L dimensions — the "
    "planning table for shrinking the ANN index (retained energy bounds "
    "the cosine perturbation). Exact integer ppm per vector on the "
    "shared quantization, aggregated to mean/min/max plus a lossy count "
    f"(< {_MAT_LOSSY_PPM} ppm). Expression-only single scan, a 3x level "
    "explode of two ints per row, partial agg to 3 rows.",
)
def ns_embed_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        quantize_vec(F.col("embedding")).alias("qv")
    )

    def energy(col):
        return F.aggregate(
            col, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
        )

    e = e.select(energy(F.col("qv")).alias("full_e"), "qv").filter(F.col("full_e") > 0)
    lev = e.select(
        F.explode(F.array(*[F.lit(lv) for lv in MATRYOSHKA_LEVELS])).alias("level"),
        "full_e",
        "qv",
    )
    r = lev.select(
        "level",
        # the DIV-64 pre-shift keeps prefix_e * 1e6 inside int64 for ANY
        # 64-dim vector at the 1e6 quantization scale (raw headroom is
        # only ~9x for unit-norm vectors — a norm^2 > 9.2 outlier would
        # silently wrap in Spark and error in DuckDB); cost is <0.02%
        # relative error on the ratio, identical in both engines.
        F.expr(
            "CAST((aggregate(slice(qv, 1, level), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x * x) DIV 64)"
            " * 1000000 DIV greatest(full_e DIV 64, 1) AS BIGINT)"
        ).alias("ret_ppm"),
    )
    return r.groupBy("level").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("CAST(sum(ret_ppm) DIV count(*) AS BIGINT)").alias("mean_ret_ppm"),
        F.min("ret_ppm").alias("min_ret_ppm"),
        F.max("ret_ppm").alias("max_ret_ppm"),
        F.sum(F.when(F.col("ret_ppm") < _MAT_LOSSY_PPM, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lossy"),
    )


# ---------------------------------------------------------------------------
# int8 symmetric quantization report (embedding compression planning)
# ---------------------------------------------------------------------------

#: Offset making truncating integer DIV behave as floor on the signed
#: rounding numerator (same guard as timeseries._HOLT_OFF): numerator
#: magnitude is bounded by 255*|v| < 2^30, far inside 2^35.
_Q8_OFF = 1 << 35


@query(
    "ns_embed_quantize_int8",
    oracle=f"""
    WITH qv AS (SELECT {{q}} AS q FROM embeddings),
    ex AS (
      SELECT i - 1 AS dim, q[i] AS v
      FROM qv CROSS JOIN (SELECT unnest(generate_series(1, {{dim}})) AS i)
    ),
    am AS (
      SELECT dim, max(abs(v)) AS amax FROM ex GROUP BY dim
      HAVING max(abs(v)) > 0
    ),
    quant AS (
      SELECT e.dim, am.amax,
             (254 * e.v + am.amax + {_Q8_OFF} * 2 * am.amax) // (2 * am.amax)
               - {_Q8_OFF} AS qi,
             e.v
      FROM ex e JOIN am ON am.dim = e.dim
    )
    SELECT dim, CAST(max(amax) AS BIGINT) AS amax,
           CAST(sum(CASE WHEN abs(qi) >= 127 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sat,
           CAST(max(abs(127 * v - qi * amax)) AS BIGINT) AS max_err127,
           CAST(sum(abs(127 * v - qi * amax)) AS BIGINT) AS sum_err127,
           CAST(1000000 * max(abs(127 * v - qi * amax))
                // (127 * max(amax)) AS BIGINT) AS max_rel_err_ppm
    FROM quant GROUP BY dim
    """.format(q=DUCK_QUANTIZE.format(col="embedding"), dim=DIM),
    doc="NS int8 symmetric quantization report per embedding dimension — "
    "the compression-planning audit run before shipping an 8-bit index "
    "(4x memory cut for ANN serving): per-dim scale (max |v|), "
    "saturation count, and exact worst/total reconstruction error in "
    "the 127-scaled integer space (err127 = |127v - q*amax| needs NO "
    "division, so it is exact in both engines; the signed round-half-up "
    "quantizer uses the repo's offset-shift so truncating DIV equals "
    "floor). Two map-side-combined passes over the posexploded vectors "
    "(scale, then error) with the dim-sized scale table broadcast — "
    "the same shape as ns_embed_dim_stats, linear at 100 TB.",
)
def ns_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = (
        e.repartition(e.sparkSession.sparkContext.defaultParallelism)
        .select(quantize_vec(F.col("embedding")).alias("q"))
        .select(F.posexplode("q").alias("dim", "v"))
    )
    am = (
        ex.groupBy("dim")
        .agg(F.max(F.abs("v")).alias("amax"))
        .filter(F.col("amax") > 0)
    )
    j = ex.join(F.broadcast(am), "dim")
    quant = j.select(
        "dim",
        "amax",
        "v",
        F.expr(
            f"(254 * v + amax + {_Q8_OFF} * 2 * amax) DIV (2 * amax) - {_Q8_OFF}"
        ).alias("qi"),
    )
    err = F.abs(127 * F.col("v") - F.col("qi") * F.col("amax"))
    return quant.groupBy("dim").agg(
        F.max("amax").cast("bigint").alias("amax"),
        F.sum(F.when(F.abs("qi") >= 127, 1).otherwise(0)).cast("bigint").alias("n_sat"),
        F.max(err).cast("bigint").alias("max_err127"),
        F.sum(err).cast("bigint").alias("sum_err127"),
        F.expr(
            "CAST(1000000 * max(abs(127 * v - qi * amax))"
            " DIV (127 * max(amax)) AS BIGINT)"
        ).alias("max_rel_err_ppm"),
    )


# ---------------------------------------------------------------------------
# Recall contract: IVF cell-probe vs brute-force ground truth
# ---------------------------------------------------------------------------


@query(
    "ns_ann_ivf_recall",
    oracle=f"""
    WITH qv AS (SELECT vec_id, label, {DUCK_QUANTIZE.format(col="embedding")} AS q FROM embeddings),
    nrm AS (
      SELECT vec_id, label, q,
             CAST(list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * q[i])) AS BIGINT) AS n2
      FROM qv
    ),
    bf_pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DUCK_DOT} AS dot, a.n2 AS na, b.n2 AS nb
      FROM nrm a JOIN nrm b ON b.vec_id != a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_COSINE} DESC, neighbor_id) AS rank
        FROM bf_pairs
      ) WHERE rank <= {TOP_K}
    ),
    flat AS (
      SELECT label, i, CAST(sum(q[i]) AS BIGINT) AS s
      FROM qv CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label, list(s ORDER BY i) AS csum,
             (SELECT count(*) FROM qv v WHERE v.label = flat.label) AS n_members
      FROM flat GROUP BY label
    ),
    assign AS (
      SELECT a.vec_id AS query_id, a.q AS qq, a.n2 AS na, c.label AS probe_label,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY CAST(list_sum(list_transform(generate_series(1, {DIM}), i -> a.q[i] * c.csum[i])) AS DOUBLE) / c.n_members DESC,
                        c.label
             ) AS cr
      FROM nrm a CROSS JOIN cent c
      WHERE a.vec_id < {N_QUERIES}
    ),
    cand AS (
      SELECT s.query_id, s.qq, s.na, b.vec_id AS neighbor_id, b.q AS nq, b.n2 AS nb
      FROM (SELECT * FROM assign WHERE cr = 1) s
      JOIN nrm b ON b.label = s.probe_label AND b.vec_id != s.query_id
    ),
    ivf_scored AS (
      SELECT query_id, neighbor_id,
             CAST(list_sum(list_transform(generate_series(1, {DIM}), i -> qq[i] * nq[i])) AS BIGINT) AS dot,
             na, nb
      FROM cand
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY {_COSINE} DESC, neighbor_id) AS rank
        FROM ivf_scored
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.query_id,
           count(*) AS n_exact,
           count(v.neighbor_id) AS n_hit,
           CAST(count(v.neighbor_id) AS DOUBLE) / count(*) AS recall
    FROM bf LEFT JOIN ivf v
      ON v.query_id = bf.query_id AND v.neighbor_id = bf.neighbor_id
    GROUP BY 1
    """,
    doc="NS ANN recall contract for the IVF route (completes the recall "
    "matrix next to ns_ann_lsh_recall): per-query recall of the "
    "single-cell IVF probe against the brute-force exact top-k. Both "
    "result sets are deterministic, so the recall fractions reproduce "
    "bit-for-bit; a single-probe IVF necessarily misses neighbors in "
    "adjacent cells, and THIS query is the measurement that sizes "
    "n_probes at 100 TB (run on a sampled panel, as with LSH).",
)
def ns_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ns_ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = ns_ann_ivf(spark, sf_dir).select(
        F.col("query_id").alias("v_query_id"),
        F.col("neighbor_id").alias("v_neighbor_id"),
    )
    joined = exact.join(
        approx,
        (F.col("query_id") == F.col("v_query_id"))
        & (F.col("neighbor_id") == F.col("v_neighbor_id")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.count("v_neighbor_id").alias("n_hit"),
        (F.count("v_neighbor_id").cast("double") / F.count("*")).alias("recall"),
    )
