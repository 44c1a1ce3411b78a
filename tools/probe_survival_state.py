"""Probe: per-batch cost of the log-structured survival frontier state.

Splits an events table into N chunk files, drains them as N micro-batches
(maxFilesPerTrigger=1), and reports per-batch foreachBatch durations from
the streaming progress log, under two knobs:

  append  — compact_fanin > N: every batch appends one delta file (the
            shipped default behavior between compactions)
  rewrite — compact_fanin = 1: every batch folds base+log and rewrites
            the whole frontier (the write-amplification shape the LSM
            form exists to avoid)

Usage: python tools/probe_survival_state.py [sf_dir] [n_chunks]
"""
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from adv_big_data_indexing_spark.sources.catalog import load_table
from adv_big_data_indexing_spark.streaming import events as ev

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="surv_probe_")
src = f"{work}/src"
e = load_table(spark, sf_dir, "events")
n_events, n_users = e.selectExpr(
    "count(*) AS n", "count(DISTINCT user_id) AS u"
).collect()[0]
e.repartition(n_chunks).write.parquet(src)
# one file per chunk dir is not needed; maxFilesPerTrigger=1 batches by file
print(f"events={n_events} users={n_users} chunks={n_chunks} sf_dir={sf_dir}")

for label, fanin in (("append", n_chunks + 1), ("rewrite", 1)):
    state = f"{work}/state_{label}"
    ck = f"{work}/ck_{label}"
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = ev.run_streaming_survival(stream, state, ck, compact_fanin=fanin)
    q.awaitTermination(1800)
    total = time.time() - t0
    durs = [
        p["batchDuration"] / 1000.0
        for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
    ]
    rows = ev._survival_frontier(spark, state).count()
    per = ", ".join(f"{d:.2f}" for d in durs)
    print(
        f"{label:8s} fanin={fanin:2d} total={total:7.2f}s "
        f"batches=[{per}] frontier_rows={rows}"
    )

# correctness cross-check: both layouts yield the identical curve
a = sorted(map(tuple, ev.streaming_survival_result(spark, f"{work}/state_append").collect()))
b = sorted(map(tuple, ev.streaming_survival_result(spark, f"{work}/state_rewrite").collect()))
print("curves_equal:", a == b, "curve_days:", len(a))
shutil.rmtree(work, ignore_errors=True)

# --- Adversarial fixture: data-sized frontier, small late batches -------
# Remap user_id := event_id (every event a distinct user → 1M-user
# frontier at sf1), load one big initial chunk, then drip small batches.
# append must stay Θ(batch); rewrite pays Θ(all users) per small batch.
spark2 = SparkSession.getActiveSession()
work = tempfile.mkdtemp(prefix="surv_probe_big_")
src = f"{work}/src"
big = e.selectExpr(
    "event_id", "ts", "event_id AS user_id", "event_type", "value", "props"
)
n_small = 4
small_rows = 10_000
big.orderBy("event_id").limit(960_000).repartition(1).write.mode("append").parquet(src)
base_files = sorted(Path(src).glob("*.parquet"))
for k in range(n_small):
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    big.filter(
        (big.event_id >= 960_000 + k * small_rows)
        & (big.event_id < 960_000 + (k + 1) * small_rows)
    ).repartition(1).write.mode("append").parquet(src)
print(f"adversarial: 1 big chunk (960k users) + {n_small} small ({small_rows} users each)")

for label, fanin in (("append", 99), ("rewrite", 1)):
    state = f"{work}/state_{label}"
    ck = f"{work}/ck_{label}"
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ev.run_streaming_survival(stream, state, ck, compact_fanin=fanin)
    q.awaitTermination(1800)
    durs = [
        p["batchDuration"] / 1000.0
        for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
    ]
    rows = ev._survival_frontier(spark, state).count()
    per = ", ".join(f"{d:.2f}" for d in durs)
    print(f"{label:8s} batches=[{per}] frontier_rows={rows}")

a = sorted(map(tuple, ev.streaming_survival_result(spark, f"{work}/state_append").collect()))
b = sorted(map(tuple, ev.streaming_survival_result(spark, f"{work}/state_rewrite").collect()))
print("curves_equal:", a == b, "curve_days:", len(a))
shutil.rmtree(work, ignore_errors=True)
