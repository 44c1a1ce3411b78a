"""Round-10 scaling probes (VERDICT r9 item 5 'Done' criteria): the
routed fuzzy join and its recall contract at every scale.

- ext_fuzzy_join_levenshtein: exact block join at sf0.1/sf1 (below
  MAX_EXACT_FUZZY_PARTS — plans and timings must match r9), ROUTED
  positional-token blocking at sf10 (2M parts; the r9 exact sweep paid
  810 s there).
- ext_fuzzy_join_token_recall: whole-corpus recall at sf0.1/sf1
  (expected 1.0 on this corpus), sliced 1-in-m recall at sf10 — the
  row also VALIDATES the slice convention against the whole-corpus
  readings, the r9 LSH-recall methodology.

Timing: best-of-2 at sf0.1/sf1, single run at sf10, full-run clock
(build + materialize — the r6 bench convention).

Usage: python tools/measure_r10.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

SF_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1", 2),
    ("sf1", "/tmp/sf1", 2),
    ("sf10", "/tmp/sf10", 1),
]


def main() -> None:
    from adv_big_data_indexing_spark.contract import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    for name in ("ext_fuzzy_join_levenshtein", "ext_fuzzy_join_token_recall"):
        for label, sf_dir, runs in SF_DIRS:
            if not Path(sf_dir).exists():
                print(f"{name} {label}: MISSING dir, skipped", flush=True)
                continue
            best = float("inf")
            rows = None
            for _ in range(runs):
                t0 = time.perf_counter()
                df = specs[name].fn(spark, sf_dir)
                if name.endswith("recall"):
                    rows = df.collect()  # 1 row: the contract values
                else:
                    df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            extra = ""
            if rows is not None:
                r = rows[0]
                extra = (
                    f" n_exact={r.n_exact} n_hit={r.n_hit}"
                    f" recall={r.recall!r}"
                )
            print(f"{name} {label}: {best:.3f}s{extra}", flush=True)


if __name__ == "__main__":
    main()
