"""Ranked retrieval over the ``documents`` table (BM25 top-k).

The reference is an Elasticsearch-backed service (SURVEY.md §1: ES 7.x
via src/elasticSearch/*.ts), and BM25 is Elasticsearch/Lucene's default
similarity — ranked full-text retrieval is therefore reference-parity
surface, not an extra. The reference's search endpoints
(src/utils/apiLogicForSearch.ts) only ever issue filter-context bool
queries (scores unused); this module supplies the scoring half of that
story in portable integer arithmetic.

Design (100 TB shape):

- tf per query term is a PER-ROW expression — ``size(filter(toks, ...))``
  over a bounded query panel — so the scan stage never explodes tokens
  and never shuffles; Catalyst keeps the whole projection in codegen.
- The corpus statistics (N, total tokens, per-term document frequency)
  reduce to ONE scalar row via a partially-aggregated global agg, then
  broadcast back — the only shuffle in the plan moves ~one row per
  partition.
- Top-k is ``ORDER BY ... LIMIT k`` → TakeOrderedAndProject (per-partition
  heap + driver merge of k·partitions rows), never a global sort.
- Scoring is bit-portable: Lucene-style idf ``ln(1 + (N-df+0.5)/(df+0.5))``
  in quarter-bits via :func:`ilog2_q4` (= ilog2_q4(2N+2) − ilog2_q4(2df+1),
  always ≥ 0), and the tf saturation ratio as a single scaled integer
  division — BM25(k1=3/2, b=1/2) multiplied through by 4·T so every
  intermediate is an exact int64:

      tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        = 10·T·tf / (4·T·tf + 3·T + 3·dl·N)        with avgdl = T/N

  scaled by 10^6 before the floor division. Overflow bound: the largest
  intermediate is 10^7·T·tf ≤ 10^7·T·dl_max — safe to T·dl_max < 9·10^11
  (sf1 is ~10^9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.functions.exact import DUCK_ILOG2_Q4, ilog2_q4
from adv_big_data_indexing_spark.functions.text import DUCK_TOKENS, tokens
from adv_big_data_indexing_spark.sources.catalog import load_table, spread

#: Fixed query panel: one rare term (df ≈ 5% of docs) and two common ones,
#: so idf spread actually drives the ranking. The OPERATOR takes any panel;
#: the constant feeds the driver contract.
BM25_QUERY = ("dup", "spark", "vector")
BM25_TOP_N = 10
_SCALE = 1_000_000


def _duck_ilog(expr: str) -> str:
    return DUCK_ILOG2_Q4.format(col=expr)


_TF_COLS = ", ".join(
    f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
    for i, t in enumerate(BM25_QUERY)
)
_DUCK_SCORE = " + ".join(
    f"({_duck_ilog('2 * n_docs + 2')} - {_duck_ilog(f'2 * df{i} + 1')})"
    f" * ((10 * {_SCALE} * t_tok * tf{i}) // (4 * t_tok * tf{i} + 3 * t_tok + 3 * dl * n_docs))"
    for i in range(len(BM25_QUERY))
)
_DUCK_MATCHED = " + ".join(
    f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(BM25_QUERY))
)


@query(
    "ns_bm25_topk",
    oracle=f"""
    WITH per AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS dl,
             {_TF_COLS}
      FROM (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents)
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS t_tok,
             {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(BM25_QUERY)))}
      FROM per
    )
    SELECT doc_id,
           CAST({_DUCK_MATCHED} AS INTEGER) AS n_matched,
           CAST({_DUCK_SCORE} AS BIGINT) AS score_q4,
           CAST(row_number() OVER (ORDER BY ({_DUCK_SCORE}) DESC, doc_id) AS INTEGER) AS rank
    FROM per CROSS JOIN tot
    WHERE {" OR ".join(f"tf{i} > 0" for i in range(len(BM25_QUERY)))}
    ORDER BY score_q4 DESC, doc_id
    LIMIT {BM25_TOP_N}
    """,
    bench=True,
    doc="NS BM25 top-k ranked retrieval (Lucene-default scoring, the "
    "reference's Elasticsearch similarity) in bit-portable integer "
    "arithmetic: per-row tf expressions (no token explode, no shuffle in "
    "the scan stage), one broadcast scalar row of corpus stats, quarter-bit "
    "integer idf, scaled-integer tf saturation, TakeOrderedAndProject "
    "top-k. The only shuffles at any corpus size are the one-row global "
    "agg and the k-row ordered take.",
)
def ns_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window  # noqa: PLC0415

    d = spread(load_table(spark, sf_dir, "documents"))
    per = d.select(
        "doc_id",
        tokens("text").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.size(F.expr(f"filter(toks, x -> x = '{t}')"))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(BM25_QUERY)
        ],
    )
    tot = per.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("t_tok"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).cast("bigint").alias(f"df{i}")
            for i in range(len(BM25_QUERY))
        ],
    )

    j = per.join(F.broadcast(tot))  # 1-row broadcast: scalar corpus stats
    idf = [
        ilog2_q4(2 * F.col("n_docs") + 2) - ilog2_q4(2 * F.col(f"df{i}") + 1)
        for i in range(len(BM25_QUERY))
    ]
    ratio = [
        F.expr(
            f"(10 * {_SCALE} * t_tok * tf{i})"
            f" div (4 * t_tok * tf{i} + 3 * t_tok + 3 * dl * n_docs)"
        )
        for i in range(len(BM25_QUERY))
    ]
    score = sum(
        (idf[i] * ratio[i] for i in range(len(BM25_QUERY))), start=F.lit(0)
    ).cast("bigint")
    matched = sum(
        (F.col(f"tf{i}") > 0).cast("int") for i in range(len(BM25_QUERY))
    ).cast("int")

    hits = (
        j.filter(" or ".join(f"tf{i} > 0" for i in range(len(BM25_QUERY))))
        .select("doc_id", matched.alias("n_matched"), score.alias("score_q4"))
        .orderBy(F.col("score_q4").desc(), "doc_id")
        .limit(BM25_TOP_N)
    )
    w = Window.orderBy(F.col("score_q4").desc(), "doc_id")
    return hits.withColumn("rank", F.row_number().over(w).cast("int"))


KEYWORDS_PER_DOC = 3


@query(
    "ns_tfidf_keywords",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS w FROM t) WHERE w <> ''
      GROUP BY 1, 2
    ),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf, df.df,
             tf.tf * (({DUCK_ILOG2_Q4.format(col="2 * n.nd + 2")})
                    - ({DUCK_ILOG2_Q4.format(col="2 * df.df + 1")})) AS score_q4,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * (({DUCK_ILOG2_Q4.format(col="2 * n.nd + 2")})
                               - ({DUCK_ILOG2_Q4.format(col="2 * df.df + 1")})) DESC,
                        tf.w) AS rnk
      FROM tf JOIN df USING (w) CROSS JOIN n
    )
    SELECT doc_id, w AS term, tf, df, CAST(score_q4 AS BIGINT) AS score_q4,
           CAST(rnk AS INTEGER) AS rnk
    FROM scored WHERE rnk <= {KEYWORDS_PER_DOC}
    """,
    doc="NS per-document keyword extraction: top-3 terms by tf-idf, with "
    "the Lucene-style idf in quarter-bit integers (ilog2_q4(2N+2) - "
    "ilog2_q4(2df+1), the same portable form BM25 uses) so scores and "
    "tie-breaks are bit-deterministic. The corpus-exploration complement "
    "to ns_bm25_topk (which ranks docs for a query; this names each "
    "doc). Shape: doc-term counts (one shuffle), vocab-sized df join, "
    "1-row broadcast N, per-doc top-k window partitioned by doc_id — "
    "never a global sort.",
)
def ns_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window  # noqa: PLC0415

    from adv_big_data_indexing_spark.functions.exact import ilog2_q4  # noqa: PLC0415
    from adv_big_data_indexing_spark.functions.text import token_rows  # noqa: PLC0415
    from adv_big_data_indexing_spark.sources.catalog import spread  # noqa: PLC0415

    d = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        token_rows(d, ["doc_id"])
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.count("*").cast("bigint").alias("df"))
    nd = d.agg(F.count("*").cast("bigint").alias("nd"))
    scored = (
        tf.join(df_t, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            "tf",
            "df",
            (
                F.col("tf")
                * (
                    ilog2_q4(F.lit(2) * F.col("nd") + F.lit(2))
                    - ilog2_q4(F.lit(2) * F.col("df") + F.lit(1))
                )
            )
            .cast("bigint")
            .alias("score_q4"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_q4").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= KEYWORDS_PER_DOC)
    )
