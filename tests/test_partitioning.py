"""Physical-layout tests: bucketed joins must plan with no Exchange;
salted joins must equal their unsalted twins exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.operators import partitioning as pt
from adv_big_data_indexing_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = load_table(spark, SF_CORRECTNESS, "orders")
    l = load_table(spark, SF_CORRECTNESS, "lineitem")
    pt.write_bucketed(o, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    pt.write_bucketed(l, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    to, tl = bucketed_tables
    # force the shuffle-join path (small test tables would broadcast,
    # hiding what bucketing buys at fact-table scale)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, l = spark.table(to), spark.table(tl)
        joined = o.join(l, o.o_orderkey == l.l_orderkey).select("o_orderkey", "l_linenumber")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-partitioned bucketed storage → sort-merge join with NO
        # shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == l.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    to, tl = bucketed_tables
    o_b, l_b = spark.table(to), spark.table(tl)
    bucketed = o_b.join(l_b, o_b.o_orderkey == l_b.l_orderkey).groupBy("o_orderstatus").count()
    o, l = load_table(spark, SF_CORRECTNESS, "orders"), load_table(spark, SF_CORRECTNESS, "lineitem")
    plain = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderstatus").count()
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_equals_plain_join(spark):
    l = load_table(spark, SF_CORRECTNESS, "lineitem")
    o = load_table(spark, SF_CORRECTNESS, "orders").select("o_orderkey", "o_orderstatus")
    salted = pt.salted_join(l, o, "l_orderkey", "o_orderkey", n_salts=8)
    plain = l.join(o, l.l_orderkey == o.o_orderkey)
    key = lambda df: sorted(  # noqa: E731
        (r.l_orderkey, r.l_linenumber, r.o_orderstatus)
        for r in df.select("l_orderkey", "l_linenumber", "o_orderstatus").collect()
    )
    assert key(salted) == key(plain)


def test_top_keys_diagnosis(spark):
    l = load_table(spark, SF_CORRECTNESS, "lineitem")
    top = pt.top_keys(l, "l_suppkey", 5).collect()
    assert len(top) == 5
    assert top[0]["count"] >= top[-1]["count"]
