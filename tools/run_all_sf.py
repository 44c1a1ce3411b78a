"""Execute every registry query at sf1 (no oracle compare) to surface
ANSI overflow / scale bugs that sf0.01 can't reach."""
import sys, time, traceback
from pyspark.sql import SparkSession
sys.path.insert(0, "/root/repo")
from adv_big_data_indexing_spark.contract import registry

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
fails = []
for name, spec in sorted(registry().items()):
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
print(f"{len(fails)} failures / {len(registry())} queries")
