"""Experiment: portable HLL (md5-derived) — Spark vs DuckDB bit-parity.

HLL defined by US, not the engine: h = first 15 hex chars of md5(value)
(60 bits); bucket = top 8 bits (2 hex chars); rho = leading zeros of the
remaining 52-bit field + 1 (string-based, exact). Estimate:
  sum_total = Σ_buckets 2^(50 - M_j)  (exact BIGINT; empty bucket M_j=0)
  E = C / double(sum_total),  C = alpha_m * m^2 * 2^50  (literal)
Linear-counting branch (E <= 2.5m and zeros>0): E = m * ln(m/zeros).
"""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.session import get_spark
from adv_big_data_indexing_spark.sources.catalog import load_table

P = 8
M = 1 << P
ALPHA = 0.7213 / (1 + 1.079 / M)
C = repr(ALPHA * M * M * float(1 << 50))
THRESH = 2.5 * M

spark = get_spark()

SPARK_EXPR = """
aggregate(transform(sequence(3, 15),
  p -> CAST(instr('0123456789abcdef', substr(md5(CAST({col} AS STRING)), p, 1)) - 1 AS BIGINT)
       * CAST(pow(16, 15 - p) AS BIGINT)),
  CAST(0 AS BIGINT), (acc, x) -> acc + x)
"""
SPARK_BUCKET = """
CAST(instr('0123456789abcdef', substr(md5(CAST({col} AS STRING)), 1, 1)) - 1 AS BIGINT) * 16
+ CAST(instr('0123456789abcdef', substr(md5(CAST({col} AS STRING)), 2, 1)) - 1 AS BIGINT)
"""

DUCK_EXPR = """
CAST(list_sum(list_transform(generate_series(3, 15),
  p -> (strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), p, 1)) - 1)
       * (16.0 ** (15 - p)))) AS BIGINT)
"""
DUCK_BUCKET = """
(strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 1, 1)) - 1) * 16
+ (strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 2, 1)) - 1)
"""


def spark_hll(sf, group, col):
    l = load_table(spark, sf, "lineitem")
    v = l.selectExpr(
        f"{group} AS g",
        f"({SPARK_BUCKET.format(col=col)}) AS bucket",
        f"({SPARK_EXPR.format(col=col)}) AS v",
    ).selectExpr(
        "g",
        "bucket",
        "CASE WHEN v = 0 THEN 53 ELSE 52 - length(trim(LEADING '0' FROM bin(v))) + 1 END AS rho",
    )
    per_bucket = v.groupBy("g", "bucket").agg(F.max("rho").alias("mj"))
    agg = per_bucket.groupBy("g").agg(
        F.sum(F.expr("CAST(pow(2, 50 - mj) AS BIGINT)")).alias("s_present"),
        F.count("*").alias("n_buckets"),
    )
    return agg.selectExpr(
        "g",
        f"s_present + ({M} - n_buckets) * CAST(pow(2, 50) AS BIGINT) AS sum_total",
        f"{M} - n_buckets AS zeros",
    ).selectExpr(
        "g",
        f"""CASE WHEN {C} / CAST(sum_total AS DOUBLE) <= {THRESH} AND zeros > 0
             THEN CAST({M} AS DOUBLE) * ln(CAST({M} AS DOUBLE) / zeros)
             ELSE {C} / CAST(sum_total AS DOUBLE) END AS approx_nd""",
    )


def duck_hll(con, sf, group, col):
    return con.execute(f"""
    WITH v AS (
      SELECT {group} AS g, ({DUCK_BUCKET.format(col=col)}) AS bucket,
             ({DUCK_EXPR.format(col=col)}) AS v
      FROM '{sf}/lineitem.parquet'
    ), r AS (
      SELECT g, bucket,
             CASE WHEN v = 0 THEN 53 ELSE 52 - length(ltrim(bin(v), '0')) + 1 END AS rho
      FROM v
    ), pb AS (
      SELECT g, bucket, max(rho) AS mj FROM r GROUP BY 1, 2
    ), agg AS (
      SELECT g, CAST(sum(CAST(2 ** (50 - mj) AS BIGINT)) AS BIGINT) AS s_present,
             count(*) AS n_buckets
      FROM pb GROUP BY 1
    )
    SELECT g,
           CASE WHEN {C} / CAST(s_present + ({M} - n_buckets) * CAST(2 ** 50 AS BIGINT) AS DOUBLE) <= {THRESH}
                     AND {M} - n_buckets > 0
                THEN CAST({M} AS DOUBLE) * ln(CAST({M} AS DOUBLE) / ({M} - n_buckets))
                ELSE {C} / CAST(s_present + ({M} - n_buckets) * CAST(2 ** 50 AS BIGINT) AS DOUBLE) END AS approx_nd
    FROM agg
    """).fetchall()


con = duckdb.connect()
for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    for col in ["l_partkey", "l_orderkey"]:
        s = {r.g: r.approx_nd for r in spark_hll(sf, "l_returnflag", col).collect()}
        d = dict(duck_hll(con, sf, "l_returnflag", col))
        exact = dict(
            con.execute(
                f"SELECT l_returnflag, count(DISTINCT {col}) FROM '{sf}/lineitem.parquet' GROUP BY 1"
            ).fetchall()
        )
        ok = all(s[k] == d[k] for k in s) and set(s) == set(d)
        errs = {k: round(abs(s[k] - exact[k]) / exact[k], 3) for k in s}
        print(f"{sf} {col}: bit-identical={ok} rel_err={errs}")
