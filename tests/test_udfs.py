"""UDF-surface tests: approx aggregates stay within their error bounds
of the exact answers; the grouped-map z-score op is internally
consistent (mean≈0, std≈1 per group)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_error_bound(spark):
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_supps)
        for r in registry()["ext_approx_distinct"].fn(spark, SF_CORRECTNESS).collect()
    }
    exact = {
        r.l_returnflag: (r.p, r.s)
        for r in load_table(spark, SF_CORRECTNESS, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_suppkey").alias("s"))
        .collect()
    }
    for k, (ap, asup) in approx.items():
        ep, es = exact[k]
        assert abs(ap - ep) / ep < 0.05
        assert abs(asup - es) / es < 0.05


def test_portable_hll_error_bound(spark):
    approx = {
        (r.l_returnflag, r.key): r.approx_nd
        for r in registry()["ext_approx_distinct_portable"].fn(spark, SF_CORRECTNESS).collect()
    }
    exact = {
        (r.l_returnflag, r.key): r.nd
        for r in load_table(spark, SF_CORRECTNESS, "lineitem")
        .selectExpr(
            "l_returnflag",
            "stack(2, 'l_partkey', l_partkey, 'l_orderkey', l_orderkey) AS (key, val)",
        )
        .groupBy("l_returnflag", "key")
        .agg(F.countDistinct("val").alias("nd"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, a in approx.items():
        # m=256 → sigma ~6.5%; 0.2 is a ~3-sigma bound
        assert abs(a - exact[k]) / exact[k] < 0.2, (k, a, exact[k])


def test_approx_percentile_close_to_exact(spark):
    approx = {
        r.l_returnflag: r.approx_median_price
        for r in registry()["ext_approx_percentile"].fn(spark, SF_CORRECTNESS).collect()
    }
    exact = {
        r.l_returnflag: r.m
        for r in load_table(spark, SF_CORRECTNESS, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .collect()
    }
    for k, a in approx.items():
        assert abs(a - exact[k]) / exact[k] < 0.05


def test_zscore_group_properties(spark):
    out = registry()["ns_udf_group_zscore"].fn(spark, SF_CORRECTNESS)
    stats = out.groupBy("source").agg(
        F.avg("zscore").alias("mu"), F.stddev_pop("zscore").alias("sd"), F.count("*").alias("n")
    )
    for r in stats.collect():
        assert abs(r.mu) < 1e-9
        assert abs(r.sd - 1.0) < 1e-9 or r.n == 1


def test_ewma_matches_pandas_reference(spark):
    import pandas as pd

    from adv_big_data_indexing_spark.operators.udfs import user_value_ewma
    from adv_big_data_indexing_spark.sources.catalog import load_table

    events = load_table(spark, SF_CORRECTNESS, "events").filter(F.col("user_id") < 5)
    got = {
        (r.user_id, r.event_id): r.ewma for r in user_value_ewma(events).collect()
    }
    pdf = events.select("user_id", "event_id", "ts", "value").toPandas()
    alpha = 0.3
    for uid, grp in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        acc = None
        for _, row in grp.iterrows():
            acc = float(row.value) if acc is None else alpha * float(row.value) + (1 - alpha) * acc
            assert got[(uid, row.event_id)] == pytest.approx(acc, abs=0, rel=0), (uid, row.event_id)


def test_ewma_equal_consecutive_values(spark):
    """Regression (ADVICE r3): pandas ewm(adjust=False) skips the update
    when the running average equals the incoming value (keeps y == x
    exactly), while the oracle CTE always computes α·x + (1−α)·y — 1 ulp
    apart for x = 0.1. The implementation must take the always-compute
    branch so parity holds on data with repeated values."""
    import datetime

    from adv_big_data_indexing_spark.operators.udfs import user_value_ewma

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, i, base + datetime.timedelta(seconds=i), 0.1) for i in range(3)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.ewma
        for r in user_value_ewma(events, alpha=0.3).collect()
    }
    assert got[0] == 0.1
    # always-compute: 0.3*0.1 + 0.7*0.1 == 0.09999999999999999 != 0.1
    expected = 0.3 * 0.1 + 0.7 * 0.1
    assert got[1] == expected and got[1] != 0.1
    assert got[2] == 0.3 * 0.1 + 0.7 * expected


def test_token_entropy_close_to_reference(spark):
    import math
    from collections import Counter

    from adv_big_data_indexing_spark.sources.catalog import load_table

    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy_nats)
        for r in registry()["ns_text_token_entropy"].fn(spark, SF_CORRECTNESS).collect()
    }
    docs = load_table(spark, SF_CORRECTNESS, "documents").select("doc_id", "text").collect()
    for d in docs[:50]:
        toks = d.text.split()
        c = Counter(toks)
        n = len(toks)
        ent = -sum((v / n) * math.log(v / n) for v in c.values())
        gn, gd, ge = got[d.doc_id]
        assert gn == n and gd == len(c)
        assert ge == pytest.approx(ent, rel=1e-12)


def test_pack_sequences_invariants_and_reference(spark):
    from adv_big_data_indexing_spark.operators.udfs import (
        PACK_CAPACITY,
        pack_documents,
    )
    from adv_big_data_indexing_spark.sources.catalog import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    got = pack_documents(docs).collect()
    assert len(got) == docs.count()  # every doc (all ≤ capacity) packed once
    assert len({r.doc_id for r in got}) == len(got)
    # bins never overflow
    from collections import defaultdict

    fill = defaultdict(int)
    for r in got:
        assert r.shard == r.doc_id % 64
        fill[(r.shard, r.bin_idx)] += r.n_tokens
    assert all(v <= PACK_CAPACITY for v in fill.values())
    # bins are reasonably dense: all but the last bin of a shard can't be
    # less than half full under FFD with items ≤ capacity/2 ... assert the
    # aggregate: total bins within 2x of the lower bound ceil(sum/cap)
    import math

    total = sum(r.n_tokens for r in got)
    lower = math.ceil(total / PACK_CAPACITY)
    assert len(fill) <= 2 * lower
    # exact match vs pure-Python FFD reference on one shard
    shard0 = sorted(
        [(r.doc_id, r.n_tokens) for r in got if r.shard == 0],
    )
    ref_rows = sorted(
        (r.doc_id, r.n_tokens)
        for r in docs.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")).collect()
        if r.doc_id % 64 == 0 and r.n_tokens <= PACK_CAPACITY
    )
    assert shard0 == ref_rows
    # determinism: rerun with different partitioning → identical assignment
    again = {
        (r.doc_id, r.bin_idx)
        for r in pack_documents(docs.repartition(13, "lang")).collect()
    }
    assert again == {(r.doc_id, r.bin_idx) for r in got}
