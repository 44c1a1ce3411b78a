"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query materializes through the noop sink (full computation, no
driver-side collect), timed after a JVM/session warmup query. Set
BENCH_ALL=1 to time every registered query instead of the headline set.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("adv-big-data-indexing-bench")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    specs = registry()
    names = sorted(
        n for n, s in specs.items() if (os.environ.get("BENCH_ALL") == "1" or s.bench)
    )

    # Steady-state warmup: run the WHOLE timed set once untimed before any
    # timing starts. The BASELINE.md DuckDB numbers are explicitly
    # steady-state (warm plans, 32 warm threads), so symmetry demands the
    # JVM reach steady state too — one pass compiles every query's codegen
    # and lets C2 finish with the shared paths (parquet decode, hash agg,
    # sort) hot; without it, whichever query runs first absorbs the JIT
    # ramp (~0.3 s) that alphabetical neighbors then don't pay.
    for name in names:
        materialize(specs[name].fn(spark, sf_dir))

    # Then per query: one more untimed run (plan re-derivation), best of
    # two timed runs — single-run timings on a 32-thread local JVM swing
    # ±0.3 s/query with machine noise, which would otherwise dominate the
    # round-over-round comparison. The timed unit REBUILDS the DataFrame
    # inside the clock: several queries materialize an eager
    # localCheckpoint during fn() (the rank machinery's boundary-
    # consistency device), and timing only the downstream materialize
    # would hide that work.
    timings: dict[str, float] = {}
    for name in names:
        materialize(specs[name].fn(spark, sf_dir))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(specs[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    out = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
