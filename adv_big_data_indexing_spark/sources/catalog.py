"""Parquet source catalog for the driver test tables.

Reads are plain ``spark.read.parquet`` so Catalyst gets the native
vectorized parquet scan with predicate pushdown, column pruning and
min/max row-group skipping for free — the Spark analog of the
reference's delegated index lookups (SURVEY.md §4.2: ES term/range
pruning ≈ parquet stats pruning).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables small enough to broadcast in any join at any scale factor
#: (region/nation are fixed-cardinality dimensions even at 100 TB).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which the
        # Spark vectorized reader rejects, so it must be read as long and
        # truncated — integer DIV, exact, matching DuckDB's ns→us truncation)
        # and plain TIMESTAMP(MICROS). Normalize either to TIMESTAMP_NTZ so
        # event-time semantics are independent of the session timezone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            ts_expr = "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"
        else:
            ts_expr = "CAST(ts AS TIMESTAMP_NTZ)"
        return df.withColumn("ts", F.expr(ts_expr)).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(path)


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of a catalog table from parquet FOOTERS, driver-side —
    no Spark job at all (routing decisions read this: the exact-vs-LSH
    dedup pair source, the brute-vs-ANN dense arm). On a parquet
    directory the counts sum across part files — walked RECURSIVELY, so
    a hive-partitioned or otherwise nested layout counts fully (ADVICE
    r8: a top-level-only listing undercounts nested layouts and would
    mis-route the routed paths toward the quadratic exact tiers at
    scale); on a bare file it reads the one footer. Equivalent to
    ``COUNT(*)`` (parquet footers store exact row counts) at zero
    job-scheduling cost."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(root, f)).num_rows
            for root, _dirs, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Ensure minimum scan parallelism before CPU-heavy per-row work.

    Single-row-group parquet (the local testdata) pins the whole scan to
    one task; a round-robin repartition lets the expensive expressions
    above it run on all cores. A no-op when the source already has at
    least cores/factor partitions — so on a real multi-file table this
    introduces no extra exchange.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * factor <= target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` entry points."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
