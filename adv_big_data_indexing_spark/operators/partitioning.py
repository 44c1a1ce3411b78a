"""Physical-layout strategies for 100 TB: bucketing for shuffle-free
co-partitioned joins, and key salting for skew.

The reference co-locates each parent with its children on one ES shard
via ``routing: parentId`` (src/utils/elasticSearch.ts:135-147) so
has_child joins never cross shards. The Spark equivalents:

- **Bucketing** (``write_bucketed``): persist both join sides bucketed
  by the join key → Catalyst plans the join with ZERO Exchange on
  either side (asserted in tests/test_partitioning.py). This is the
  storage-level contract a 1000-executor deployment would give the
  entity/edges tables (bucket by parent_key).
- **Salting** (``salted_join``): a hot key floods one reducer in a
  shuffle join. Split each hot left row into one of N sub-keys and
  replicate the right row N ways → the hot key's work spreads over N
  tasks. AQE's skew-join handles moderate skew automatically; salting
  is the explicit contract for pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side and
    replicate the right side ``n_salts`` ways.

    Result is exactly the plain join (salt columns are dropped); only
    the physical distribution changes. Deterministic: the salt is a
    hash of the whole left row, not a random draw.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (l_salted[left_key] == r_replicated[right_key]) & (
        l_salted["__salt"] == r_replicated["__salt"]
    )
    return l_salted.join(r_replicated, cond, how).drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: heaviest keys by row count (run before choosing
    between AQE skew handling and explicit salting)."""
    return df.groupBy(key).count().orderBy(F.col("count").desc(), F.col(key)).limit(n)


# ---------------------------------------------------------------------------
# Z-order (Morton curve) layout: multi-dimensional data skipping
# ---------------------------------------------------------------------------

from adv_big_data_indexing_spark.contract import query  # noqa: E402
from adv_big_data_indexing_spark.sources.catalog import load_table  # noqa: E402

#: (shift, mask) chain that spreads a 16-bit int onto even bit positions
_SPREAD16 = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread16(x):
    """16-bit value -> its bits at even positions of a 32-bit word."""
    x = x.cast("bigint")
    for sh, mask in _SPREAD16:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def zvalue(a, b):
    """Morton z-value interleaving two 16-bit dimensions (a=even bits,
    b=odd bits). Sorting by it clusters rows that are close in BOTH
    dimensions, so parquet row-group min/max stats prune on either
    predicate column — the layout trick single-column sorting can't do."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def duck_spread16(x: str) -> str:
    e = f"CAST({x} AS BIGINT)"
    for sh, mask in _SPREAD16:
        e = f"(({e} | ({e} << {sh})) & {mask})"
    return e


def duck_zvalue(a: str, b: str) -> str:
    return f"({duck_spread16(a)} | ({duck_spread16(b)} << 1))"


def zorder_layout(df: DataFrame, col_a: str, col_b: str, n_partitions: int = 16) -> DataFrame:
    """Range-partition + sort by z-value: the write-side layout pass a
    100 TB table gets before persisting (each output file covers a small
    rectangle of (a, b) space → min/max skipping serves both dimensions)."""
    z = zvalue(F.pmod(F.col(col_a), F.lit(65536)), F.pmod(F.col(col_b), F.lit(65536)))
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
    )


@query(
    "ns_layout_zorder",
    oracle=f"""
    SELECT {duck_zvalue("l_partkey % 65536", "l_suppkey % 65536")} >> 26 AS zbucket,
           count(*) AS n,
           min({duck_zvalue("l_partkey % 65536", "l_suppkey % 65536")}) AS zmin,
           max({duck_zvalue("l_partkey % 65536", "l_suppkey % 65536")}) AS zmax
    FROM lineitem
    GROUP BY 1
    """,
    doc="NS z-order (Morton) curve over (l_partkey, l_suppkey): 64-cell "
    "histogram of the interleaved-bit key used by `zorder_layout` for "
    "two-dimensional file skipping. Pure bitwise expressions — identical "
    "integer results in any engine.",
)
def ns_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    z = zvalue(
        F.pmod(F.col("l_partkey"), F.lit(65536)),
        F.pmod(F.col("l_suppkey"), F.lit(65536)),
    )
    return (
        l.select(z.alias("__z"))
        .groupBy(F.shiftright(F.col("__z"), 26).alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("__z").alias("zmin"),
            F.max("__z").alias("zmax"),
        )
    )
