"""Probe: per-batch cost of the streaming funnel twin as the maintained
state grows (the r10 sibling of probe_dedup_index.py).

Streams an events table in equal chunks (maxFilesPerTrigger=1; the
event_id % n split scatters every user's steps across batches in
arbitrary time order) and reports per-batch foreachBatch durations,
then cross-checks the final funnel table against the batch ts_funnel
on the same corpus via a count+xxhash64 digest. The honest quantities
under test: per-batch work should track batch size (the growing terms
are the h-row probe scan and the candidate log), and the result must
be EXACT under the maximal out-of-order chunking.

Usage: python tools/probe_funnel.py [sf_dir] [n_chunks] [fanin]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.sources.catalog import load_table
from adv_big_data_indexing_spark.streaming import events as ev

# --reliable-tight: the r9 negative-sampling certification shape
# (VERDICT r10 item 7) — deliberately tight heap on many cores with
# spark.advbdi.checkpoint=reliable, so any operator that consults the
# checkpoint policy takes the cluster-mode path under memory pressure
tight = "--reliable-tight" in sys.argv
argv = [a for a in sys.argv if a != "--reliable-tight"]
sf_dir = argv[1] if len(argv) > 1 else "/tmp/sf1"
n_chunks = int(argv[2]) if len(argv) > 2 else 10
fanin = int(argv[3]) if len(argv) > 3 else ev.FUNNEL_COMPACT_FANIN

builder = (
    SparkSession.builder.master("local[32]" if tight else "local[8]")
    .config("spark.sql.shuffle.partitions", "32" if tight else "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "8g" if tight else "16g")
)
spark = builder.getOrCreate()
if tight:
    spark.conf.set("spark.advbdi.checkpoint", "reliable")
    spark.sparkContext.setCheckpointDir("/tmp/funnel_reliable_ckdir")
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="funnel_probe_")
src = f"{work}/src"
events = load_table(spark, sf_dir, "events")
n_events = events.count()
for k in range(n_chunks):
    events.filter(F.col("event_id") % n_chunks == k).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
print(f"events={n_events} chunks={n_chunks} fanin={fanin} sf_dir={sf_dir}")

state = f"{work}/state"
stream = (
    spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
)
t0 = time.time()
# delay large enough that the %n_chunks shuffle never drops (equality
# run); the horizon machinery still executes on every batch
q = ev.run_streaming_funnel(
    stream, state, f"{work}/ck", delay_sec=10**9, compact_fanin=fanin
)
q.awaitTermination(3600)
total = time.time() - t0
durs = [
    p["batchDuration"] / 1000.0
    for p in (q.recentProgress or [])
    if p.get("numInputRows", 0) > 0
]
print(f"total={total:.1f}s batches=[{', '.join(f'{d:.2f}' for d in durs)}]")


def _digest(df):
    row = df.select(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64(
                "user_id", "signup_us", "click_us", "purchase_us",
                "reached_click", "reached_purchase",
            ).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return row.n, row.h


from adv_big_data_indexing_spark.operators.timeseries import ts_funnel

s_n, s_h = _digest(ev.streaming_funnel_result(spark, state))
b_n, b_h = _digest(ts_funnel(spark, sf_dir))
print(f"users={s_n} batch_users={b_n} equals_batch={(s_n, s_h) == (b_n, b_h)}")

import shutil

shutil.rmtree(work, ignore_errors=True)
