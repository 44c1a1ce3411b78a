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
