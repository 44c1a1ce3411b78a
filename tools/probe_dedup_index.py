"""Probe: per-batch cost of the streaming incremental dedup index as
the indexed corpus grows.

Streams a documents table in equal chunks (maxFilesPerTrigger=1) and
reports per-batch foreachBatch durations plus the accumulated pair
count, then cross-checks the final pair set against the batch
ns_dedup_minhash_lsh on the same corpus. The honest quantity under
test: per-batch work should track batch size + collisions; the
band-log probe scan is the component that grows with the index. The
fix shipped in r11 (broadcast semi prunes + dk-partitioned sigs base);
tools/probe_statelog_bucketing.py measures it old-vs-new at a
10^6-doc index (BASELINE.md r11).

Usage: python tools/probe_dedup_index.py [sf_dir] [n_chunks] [fanin]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.sources.catalog import load_table
from adv_big_data_indexing_spark.streaming import corpus as sc

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 10
fanin = int(sys.argv[3]) if len(sys.argv) > 3 else sc.CORPUS_COMPACT_FANIN

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    # sf10's pair log is ~24M rows; the equality check below is a hash
    # aggregate (never a driver collect), but compaction + the batch op
    # want JVM headroom at that scale
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="dedup_idx_probe_")
src = f"{work}/src"
docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
n_docs = docs.count()
for k in range(n_chunks):
    docs.filter(F.col("doc_id") % n_chunks == k).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
print(f"docs={n_docs} chunks={n_chunks} fanin={fanin} sf_dir={sf_dir}")

state = f"{work}/state"
stream = (
    spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
)
t0 = time.time()
q = sc.run_streaming_dedup_index(stream, state, f"{work}/ck", compact_fanin=fanin)
q.awaitTermination(3600)
total = time.time() - t0
durs = [
    p["batchDuration"] / 1000.0
    for p in (q.recentProgress or [])
    if p.get("numInputRows", 0) > 0
]
print(f"total={total:.1f}s batches=[{', '.join(f'{d:.2f}' for d in durs)}]")

# order-insensitive exact comparison WITHOUT a driver collect (sf10's
# pair set is ~24M rows): count + sum of a row hash over the full tuple,
# identical expressions on both sides — jaccard is a deterministic
# correctly-rounded double, so hashing its string form is stable
def _digest(df):
    row = df.select(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64(
                "doc_a", "doc_b", "n_inter", F.format_number("jaccard", 17)
            ).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return row.n, row.h


from adv_big_data_indexing_spark.operators.dedup import ns_dedup_minhash_lsh

s_n, s_h = _digest(sc.streaming_dedup_pairs(spark, state))
b_n, b_h = _digest(ns_dedup_minhash_lsh(spark, sf_dir))
print(f"pairs={s_n} batch_pairs={b_n} equals_batch={(s_n, s_h) == (b_n, b_h)}")

import shutil

shutil.rmtree(work, ignore_errors=True)
