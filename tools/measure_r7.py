"""Round-7 scaling measurements: the queries whose plans changed this
round (CMS pool-then-rank, per-lang pooled top-k, the grouped rank
machinery rewrites, and the re-parameterized global machinery callers)
at sf0.1 and sf1, Spark vs the DuckDB oracle — the BASELINE.md
evidence format.

Usage: python tools/measure_r7.py [sf_dir ...]   (default sf0.1 + /tmp/sf1)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "ns_sketch_cms_heavy_hitters",
    "ns_text_top_terms",
    "ns_text_heavy_hitters",
    "ext_window_ntile",
    "ns_corpus_shuffle",
    "ns_preference_pairs",
    "ext_equidepth_histogram",
    "ext_rfm_segmentation",
    "ext_auc_exact",
    "ext_percentile",
    "ext_window_distribution",
    "ts_max_concurrency",
    "ns_negative_sampling",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_time(sf_dir: str, sql: str) -> float:
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    con.execute(sql).fetchall()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return best


def main() -> None:
    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark("measure-r7")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for sf_dir in sf_dirs:
        print(f"== {sf_dir}")
        for name in QUERIES:
            spec = specs[name]
            mat(spec.fn(spark, sf_dir))  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                mat(spec.fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            d = duck_time(sf_dir, spec.oracle) if spec.oracle else float("nan")
            print(f"{name}: spark {best:.3f}s duck {d:.3f}s")


if __name__ == "__main__":
    main()
