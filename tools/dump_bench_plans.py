"""Dump explain('formatted') for every bench-headline query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan
evidence (OPTIMIZATION_r13.md cites these files).

Usage: python tools/dump_bench_plans.py <tag> <suffix> [sf_dir] [names...]
  e.g. python tools/dump_bench_plans.py r13 before
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adv_big_data_indexing_spark.contract import registry
from adv_big_data_indexing_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and Path(rest[0]).is_dir():
        sf_dir, rest = rest[0], rest[1:]
    spark = get_spark("plan-dump-bench")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()
    names = rest or sorted(n for n, s in specs.items() if s.bench)
    outdir = Path(__file__).resolve().parent.parent / "plans" / tag
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(
            f"# {name} — explain(formatted) @ {sf_dir} [{suffix}]\n"
            + buf.getvalue()
        )
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
