"""Execute every registry query at sf1 (no oracle compare) to surface
ANSI overflow / scale bugs that sf0.01 can't reach.

Usage: python tools/run_all_sf.py [SF_DIR] [checkpoint_mode] [start_from]
  checkpoint_mode: local (default) | reliable — "reliable" certifies the
  cluster-grade checkpoint path (spark.advbdi.checkpoint=reliable routed
  through consistent_materialize) end-to-end across the whole registry
  (VERDICT r7 item 4).
  start_from: resume the alphabetical sweep at this query name
  (inclusive) — for continuing after a mid-sweep kernel OOM kill (r9).

RUN_ONLY=<a,b,c> (env) restricts the sweep to the named queries — the
r13 idle-window re-timing of the sweep's slowest tail (VERDICT r12
item 6) without paying a whole-registry pass."""
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from adv_big_data_indexing_spark.contract import registry  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
mode = sys.argv[2] if len(sys.argv) > 2 else "local"
ckpt_dir = None
if mode == "reliable":
    ckpt_dir = f"/tmp/advbdi_ckpt_{os.getpid()}"
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    spark.conf.set("spark.advbdi.checkpoint", "reliable")
start_from = sys.argv[3] if len(sys.argv) > 3 else None
print(f"sweep: sf_dir={sf} checkpoint={mode} start_from={start_from}", flush=True)
fails = []
n_run = 0
only = {n for n in os.environ.get("RUN_ONLY", "").split(",") if n}
for name, spec in sorted(registry().items()):
    if start_from is not None and name < start_from:
        continue
    if only and name not in only:
        continue
    n_run += 1
    t0 = time.time()
    try:
        spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
        status = f"ok {time.time()-t0:6.1f}s"
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        fails.append((name, msg))
        status = f"FAIL {msg}"
    print(f"{name:36s} {status}", flush=True)
print("\n=== failures ===")
for n, m in fails:
    print(n, "::", m)
print(f"{len(fails)} failures / {n_run} queries run ({len(registry())} registered)")
if ckpt_dir:
    shutil.rmtree(ckpt_dir, ignore_errors=True)
