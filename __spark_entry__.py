"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementations live in ``adv_big_data_indexing_spark``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from adv_big_data_indexing_spark.contract import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001.

    The reference's signature capability (SURVEY.md §2.C): a has_child
    semi-join — "parents having ≥1 child matching a predicate"
    (allParentsHaving, apiLogicForSearch.ts:245-294) — followed by
    OP-C1-style reconstruction nesting the child objects back under the
    parent, here rendered on the star schema: customers having an
    urgent high-value order, with those orders re-nested as an
    objectId-sorted array<struct>.
    """
    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.sources.catalog import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    c = load_table(spark, SMOKE_SF_DIR, "customer")
    o = load_table(spark, SMOKE_SF_DIR, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200000.0)
    )
    parents = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    nested = o.groupBy("o_custkey").agg(
        F.array_sort(
            F.collect_list(F.struct("o_orderkey", "o_totalprice", "o_orderdate"))
        ).alias("urgent_orders"),
        F.count("*").alias("n_urgent"),
    )
    return parents.join(nested, parents.c_custkey == nested.o_custkey).select(
        "c_custkey", "c_name", "c_mktsegment", "n_urgent", "urgent_orders"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Event-time semantics and timestamp hashing assume UTC.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in sorted(registry().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle for name, spec in sorted(registry().items()) if spec.oracle is not None
    }
