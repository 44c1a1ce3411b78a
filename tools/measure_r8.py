"""Round-8 scaling measurements (BASELINE.md evidence format):

1. VERDICT r7 item 6 — the dedup tail at adversarial density:
   ns_dedup_components + ns_dedup_cluster_stats at sf0.1 / sf1 / sf10
   (sf10's word-list rotation wraps → ~24M true near-dup pairs feed the
   large-star/small-star iteration and the cluster rollup).
2. VERDICT r7 item 5 — ns_hybrid_rrf_fusion after the dense-arm routing
   change (sf0.1 / sf1, brute route at these sizes) plus the FORCED LSH
   route at the same SFs (the >cap path, timed via _dense_pool_ranks
   with brute_cap=0).
3. VERDICT r7 item 4 — the reliable-checkpoint tax: every bench-headline
   query timed local-then-reliable back-to-back in ONE session at sf0.1.

Usage: python tools/measure_r8.py [dedup|rrf|reliable] (default: all)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def _spark_time(fn, spark, sf_dir: str, runs: int = 2) -> float:
    _mat(fn(spark, sf_dir))  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _mat(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best


def run_dedup_tail(spark, specs) -> None:
    print("== dedup tail at adversarial density (item 6)")
    for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"):
        if not Path(sf_dir).exists():
            print(f"  {sf_dir}: MISSING, skipped")
            continue
        for name in ("ns_dedup_components", "ns_dedup_cluster_stats"):
            best = _spark_time(specs[name].fn, spark, sf_dir, runs=1 if "sf10" in sf_dir else 2)
            print(f"{sf_dir} {name}: spark {best:.3f}s", flush=True)


def run_rrf(spark, specs) -> None:
    from adv_big_data_indexing_spark.operators.retrieval import _dense_pool_ranks

    print("== hybrid RRF after dense-arm routing (item 5)")
    for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1"):
        if not Path(sf_dir).exists():
            continue
        spec = specs["ns_hybrid_rrf_fusion"]
        best = _spark_time(spec.fn, spark, sf_dir)
        d = duck_time(sf_dir, spec.oracle)
        # forced big-corpus route: same dense arm through the LSH pruner
        _mat(_dense_pool_ranks(spark, sf_dir, brute_cap=0))
        t0 = time.perf_counter()
        _mat(_dense_pool_ranks(spark, sf_dir, brute_cap=0))
        lsh = time.perf_counter() - t0
        print(
            f"{sf_dir} ns_hybrid_rrf_fusion: spark {best:.3f}s duck {d:.3f}s"
            f" dense-arm-forced-LSH {lsh:.3f}s",
            flush=True,
        )


def run_reliable_tax(spark, specs) -> None:
    print("== reliable-checkpoint tax on the bench headline set (item 4)")
    sf_dir = "/root/testdata/sf0.1"
    spark.sparkContext.setCheckpointDir("/tmp/advbdi_ckpt_measure_r8")
    names = sorted(n for n, s in specs.items() if s.bench)
    tot_local = tot_rel = 0.0
    for name in names:
        spark.conf.set("spark.advbdi.checkpoint", "local")
        t_local = _spark_time(specs[name].fn, spark, sf_dir)
        spark.conf.set("spark.advbdi.checkpoint", "reliable")
        t_rel = _spark_time(specs[name].fn, spark, sf_dir)
        spark.conf.set("spark.advbdi.checkpoint", "local")
        tot_local += t_local
        tot_rel += t_rel
        flag = " <-- uses ckpt" if abs(t_rel - t_local) > 0.15 else ""
        print(f"{name}: local {t_local:.3f}s reliable {t_rel:.3f}s{flag}", flush=True)
    print(f"TOTAL: local {tot_local:.3f}s reliable {tot_rel:.3f}s")
    import shutil

    shutil.rmtree("/tmp/advbdi_ckpt_measure_r8", ignore_errors=True)


def main() -> None:
    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("measure-r8")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()
    if which in ("all", "dedup"):
        run_dedup_tail(spark, specs)
    if which in ("all", "rrf"):
        run_rrf(spark, specs)
    if which in ("all", "reliable"):
        run_reliable_tax(spark, specs)


if __name__ == "__main__":
    main()
