"""Dump the EXECUTED (post-AQE) plan for bench queries and count the
subtree-sharing observables (VERDICT r13 item 5): FileScan /
ReusedExchange / InMemoryTableScan / ExistingRDD occurrences per query.

The r13 LSH triple-execution find came from the executed plan, not the
static one — `explain("formatted")` before execution shows
`isFinalPlan=false` and hides both AQE rewrites and the CacheManager's
InMemoryRelation substitutions as they actually ran. This tool
materializes each query through the noop sink, then walks
`df._jdf.queryExecution().executedPlan()` (the final adaptive plan).

Usage: python tools/dump_executed_plans.py <tag> <suffix> [sf_dir] [names...]
  writes plans/<tag>/<query>_<suffix>_executed.txt and prints a count
  table to stdout.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.session import get_spark

#: (label, regex) — "Exchange" alone would also match Broadcast/Reused
_COUNT_NODES = (
    ("FileScan", r"FileScan"),
    ("ReusedExchange", r"ReusedExchange"),
    ("InMemoryTableScan", r"InMemoryTableScan"),
    ("ExistingRDD", r"Scan ExistingRDD"),
    ("ShuffleExchange", r"(?<!Reused)Exchange (?:hash|range|Round|Single)"),
    ("BroadcastExchange", r"BroadcastExchange"),
    ("SortMergeJoin", r"SortMergeJoin"),
    ("BroadcastHashJoin", r"BroadcastHashJoin"),
    ("BatchEvalPython", r"BatchEvalPython"),
    ("ArrowEvalPython", r"ArrowEvalPython|MapInArrow|FlatMapGroupsIn"),
)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and Path(rest[0]).is_dir():
        sf_dir, rest = rest[0], rest[1:]
    spark = get_spark("executed-plan-dump")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()
    names = rest or sorted(n for n, s in specs.items() if s.bench)
    outdir = Path(__file__).resolve().parent.parent / "plans" / tag
    outdir.mkdir(parents=True, exist_ok=True)
    header = "query\t" + "\t".join(label for label, _ in _COUNT_NODES)
    print(header)
    for name in names:
        spark.sparkContext.setJobDescription(f"executed-plan: {name}")
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        (outdir / f"{name}_{suffix}_executed.txt").write_text(
            f"# {name} — executedPlan (post-AQE, after noop materialize) "
            f"@ {sf_dir} [{suffix}]\n" + plan
        )
        counts = [
            str(len(re.findall(rx, plan))) for _, rx in _COUNT_NODES
        ]
        print(name + "\t" + "\t".join(counts))
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
