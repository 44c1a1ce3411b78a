"""Round-13 (optimization round) measurement probe.

Per named bench query, separates WHERE the wall time goes at sf0.1:

- ``build_s``   — fn(spark, sf_dir): DataFrame construction, including
  any eager consistent_materialize jobs the operator runs inside fn()
  (the iterative operators' Lloyd/star/merge loops live here);
- ``mat1_s``    — first noop materialize of the returned frame (fresh
  analysis + optimization + codegen + execution);
- ``mat2_s``    — second noop materialize of the SAME DataFrame object
  (execution with warm plan: isolates Catalyst re-analysis cost, since
  a re-used DataFrame caches its QueryExecution);
- ``rebuild_s`` — fn() + materialize rebuilt from scratch (the bench's
  timed unit, for continuity).

A query whose rebuild_s >> mat2_s is dominated by driver-side plan
work (analysis/optimization/codegen or eager per-iteration jobs), not
by data — the optimization target is the plan, not the executors
(guide §1.1 first-principles view / §7.3 driver work).

Usage: python tools/measure_r13.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.session import get_spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args
    spark = get_spark("measure-r13")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"measure_r13 warmup: {name}")
        _noop(fn(spark, sf_dir))  # warm codegen/JIT once, untimed
        spark.sparkContext.setJobDescription(f"measure_r13: {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _noop(df)
        t2 = time.perf_counter()
        _noop(df)
        t3 = time.perf_counter()
        _noop(fn(spark, sf_dir))
        t4 = time.perf_counter()
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "mat1_s": round(t2 - t1, 3),
            "mat2_s": round(t3 - t2, 3),
            "rebuild_s": round(t4 - t3, 3),
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
