"""Round-12 bench-baseline refresh (VERDICT r11 item 2): the headline
set grew from 19 to 24 queries (ns_semdedup_kmeans, ns_embed_pca_power,
ns_graph_pagerank, ts_seasonal_decompose, ns_dedup_components — the
heaviest post-r6 operators), so the DuckDB side of the WHOLE new set is
re-measured here in one sitting on a quiet machine: warm view + one
warmup run, then best-of-2, threads=32 — the same steady-state
convention as every BASELINE.md DuckDB number since r4.

Prints per-query seconds, the NEW 24-query total (the number BENCH_r12
compares against), and the old 19-query subtotal for continuity with
BENCH_r06..r11.

Usage: python tools/measure_r12.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NEW_IN_R12 = {
    "ns_semdedup_kmeans",
    "ns_embed_pca_power",
    "ns_graph_pagerank",
    "ts_seasonal_decompose",
    "ns_dedup_components",
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    from adv_big_data_indexing_spark.contract import registry

    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load = Path("/proc/loadavg").read_text().split()[0]
    print(f"sf_dir={sf_dir} load_before={load}")

    specs = registry()
    names = sorted(n for n, s in specs.items() if s.bench)
    assert all(specs[n].oracle for n in names), "bench query without oracle"

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    # steady-state: one whole-set warmup pass first (mirrors bench.py's
    # warmup so neither engine's first-query ramp lands in the totals)
    for n in names:
        con.execute(specs[n].oracle).fetchall()

    timings: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(specs[n].oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[n] = best
        print(f"{n}: {best:.3f}s{'  [new in r12]' if n in NEW_IN_R12 else ''}")
    con.close()

    total = sum(timings.values())
    old19 = sum(v for n, v in timings.items() if n not in NEW_IN_R12)
    new5 = total - old19
    print(f"old-19-query DuckDB subtotal: {old19:.2f}s")
    print(f"r12 additions subtotal:       {new5:.2f}s")
    print(f"NEW 24-query DuckDB baseline: {total:.2f}s")
    print(f"load_after={Path('/proc/loadavg').read_text().split()[0]}")


if __name__ == "__main__":
    main()
