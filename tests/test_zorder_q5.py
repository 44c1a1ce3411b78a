"""Z-order layout + TPC-H-Q5-shape join: correctness and plan quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from adv_big_data_indexing_spark.operators.partitioning import (
    zorder_layout,
    zvalue,
)
from adv_big_data_indexing_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS
from tests.test_plan_quality import plan_of


def _py_z(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bit_interleave_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(pairs, "a int, b int").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_z(r.a, r.b), (r.a, r.b)


def test_zorder_layout_partitions_are_disjoint_and_local(spark):
    l = load_table(spark, SF_CORRECTNESS, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    laid = zorder_layout(l, "l_partkey", "l_suppkey", n_partitions=8)
    per_part = (
        laid.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.min("__z").alias("zlo"),
            F.max("__z").alias("zhi"),
            F.min("l_partkey").alias("alo"),
            F.max("l_partkey").alias("ahi"),
            F.min("l_suppkey").alias("blo"),
            F.max("l_suppkey").alias("bhi"),
        )
        .collect()
    )
    # range partitioning on z => partition z-intervals never overlap
    spans = sorted((r.zlo, r.zhi) for r in per_part)
    for (_, hi), (lo2, _) in zip(spans, spans[1:]):
        assert hi <= lo2
    # locality: each partition's bounding box covers a small fraction of
    # the full (partkey, suppkey) rectangle on at least one axis — the
    # property min/max skipping needs (a single-column sort gives ~full
    # width on the secondary axis for every file)
    ga = l.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    aw = ga[1] - ga[0] or 1
    fracs = [(r.ahi - r.alo) / aw for r in per_part]
    assert min(fracs) < 0.6
    assert sum(fracs) / len(fracs) < 0.9


def test_q5_plan_broadcasts_dims_and_pushes_date(spark):
    p = plan_of(spark, "ext_join_tpch_q5")
    # region, nation, supplier (+customer at this SF) ride broadcasts;
    # the lineitem⋈orders shuffle is the only sort-merge candidate
    assert p.count("BroadcastHashJoin") >= 3
    # the date-range predicate reached the orders parquet scan
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert "LessThan(o_orderdate" in p
    # region filter pushed too
    assert "EqualTo(r_name,ASIA)" in p
    # revenue aggregate is partial map-side
    assert "partial_sum" in p
