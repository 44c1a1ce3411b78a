"""Experiment: ext_agg_groupby (TPC-H Q1 shape) arithmetic variants at sf0.1."""
import time

from pyspark.sql import functions as F

from adv_big_data_indexing_spark.session import get_spark
from adv_big_data_indexing_spark.sources.catalog import load_table, spread
from adv_big_data_indexing_spark.functions.exact import dec, sum_money, avg_money

SF = "/root/testdata/sf0.1"
spark = get_spark()


def v_current():
    l = spread(load_table(spark, SF, "lineitem")).filter(
        F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        sum_money("l_quantity", "sum_qty"),
        sum_money("l_extendedprice", "sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        avg_money("l_quantity", "avg_qty"),
        avg_money("l_extendedprice", "avg_price"),
        F.count("*").alias("count_order"),
    )


def _longs(l):
    # exact: money values have <=2 decimals; round(x*100) is the exact integer
    e = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    q = F.round(F.col("l_quantity") * 100).cast("bigint")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    t = F.round(F.col("l_tax") * 100).cast("bigint")
    disc = e * (F.lit(100) - d)          # scale 1e4
    charge = disc * (F.lit(100) + t)     # scale 1e6
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(q).cast("double") / 100).alias("sum_qty"),
        (F.sum(e).cast("double") / 100).alias("sum_base_price"),
        (F.sum(disc).cast("double") / 10000).alias("sum_disc_price"),
        (F.sum(charge).cast("double") / 1000000).alias("sum_charge"),
        (F.sum(q).cast("double") / 100 / F.count("l_quantity")).alias("avg_qty"),
        (F.sum(e).cast("double") / 100 / F.count("l_extendedprice")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


def v_longs_spread():
    l = spread(load_table(spark, SF, "lineitem")).filter(
        F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return _longs(l)


def v_longs_nospread():
    l = load_table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return _longs(l)


def v_dec_nospread():
    l = load_table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        sum_money("l_quantity", "sum_qty"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


for name, fn in [
    ("current(dec+spread)", v_current),
    ("longs+spread", v_longs_spread),
    ("longs_nospread", v_longs_nospread),
    ("dec_nospread", v_dec_nospread),
]:
    times = []
    for i in range(4):
        t0 = time.time()
        rows = fn().collect()
        times.append(time.time() - t0)
    print(f"{name:22s} runs={['%.3f' % t for t in times]} best={min(times):.3f} rows={len(rows)}")

# value check: longs vs decimal
a = {tuple(r[:2]): r[2:] for r in v_current().collect()}
b = {tuple(r[:2]): r[2:] for r in v_longs_spread().collect()}
same = all(a[k] == b[k] for k in a)
print("values identical:", same, len(a), len(b))

def v_longs_dec38():
    l = load_table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    e = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    q = F.round(F.col("l_quantity") * 100).cast("bigint")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    t = F.round(F.col("l_tax") * 100).cast("bigint")
    disc = (e * (F.lit(100) - d)).cast("decimal(38,0)")
    charge = (e * (F.lit(100) - d) * (F.lit(100) + t)).cast("decimal(38,0)")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(q.cast("decimal(38,0)")).cast("double") / 100).alias("sum_qty"),
        (F.sum(disc).cast("double") / 10000).alias("sum_disc_price"),
        (F.sum(charge).cast("double") / 1000000).alias("sum_charge"),
        F.count("*").alias("count_order"),
    )

times = []
for i in range(4):
    t0 = time.time(); rows = v_longs_dec38().collect(); times.append(time.time() - t0)
print(f"longs_dec38_nospread  runs={['%.3f' % t for t in times]} best={min(times):.3f}")
