"""Driver simulation: vanilla session, first-50 window + entry smoke."""
import sys, json, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master("local[8]").getOrCreate()
import __spark_entry__ as E
from tests.parity import compare, assert_driver_canon_safe

rows = E.entry(spark).collect()
print("entry rows:", len(rows)); assert len(rows) > 0

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = E.queries()
oracles = E.oracle_sql()
window = sorted(qs)[:50]
bad = []
for name in window:
    try:
        sdf = qs[name](spark, SF)
        if name in oracles:
            problems = compare(sdf, con.execute(oracles[name]))
        else:
            problems = assert_driver_canon_safe(sdf)
            n = sdf.count()
            problems += [] if n >= 0 else ["negative count?"]
    except Exception as e:
        problems = [f"EXC: {type(e).__name__}: {e}"]
    status = "ok" if not problems else "FAIL"
    print(f"{status} {name}")
    if problems:
        bad.append((name, problems))
for name, probs in bad:
    print("=" * 60, "\n", name)
    for p in probs: print(p[:2000])
print(f"\n{len(window) - len(bad)}/{len(window)} green")
sys.exit(1 if bad else 0)
