"""Price the two order-dependent per-row folds (VERDICT r11 item 7):
ORDER_DEPENDENT_FOLDS = {holt_forecasts, holt_winters_monitor} are the
only applyInPandasWithState kernels still iterating per row (integer
floor-division recurrences with a carried (level, trend[, seasonal])
state — no closed form, so no vectorization), and this probe measures
what that per-row label COSTS: the pure fold-kernel throughput (rows/s
per core) on production-shaped batches, pandas-boxed exactly as the
kernels read their input (`for v in pdf[col]` — numpy scalar boxing
included), no Spark in the loop.

Iteration domains (what a "row" is):
- holt_forecasts: one RAW event row per user per batch — the per-row
  cost is paid once per ingested event of a monitored series;
- holt_winters_monitor: one HOURLY ROLLUP bucket per event_type per
  batch (the upstream windowed pre-aggregate) — 24 rows per series per
  DAY, so its loop is output-sized, not event-sized.

Usage: python tools/probe_holt_fold_throughput.py [n_rows]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adv_big_data_indexing_spark.operators.timeseries import (  # noqa: E402
    HOLT_ADIV,
    HOLT_BDIV,
    HW_DIV,
    HW_PERIOD,
)


def holt_kernel(values: pd.Series) -> tuple[int, int, int]:
    """The holt_forecasts inner loop, verbatim (events.py)."""
    l, b, n = 0, 0, 0
    for v in values:
        x = int(math.floor(float(v) * 1000.0))
        if n == 0:
            l, b = x, 0
        else:
            d = (x - l - b) // HOLT_ADIV
            l = l + b + d
            b = b + d // HOLT_BDIV
        n += 1
    return l, b, n


def hw_kernel(hs: pd.Series, xs: pd.Series) -> tuple[int, int, int, int]:
    """The holt_winters_monitor inner loop, verbatim (events.py)."""
    l, b, n, last_h = 0, 0, 0, -1
    s = [0] * HW_PERIOD
    for h, x in zip((int(v) for v in hs), (int(v) for v in xs)):
        if n == 0:
            l, b = x, 0
        else:
            i = h % HW_PERIOD
            s_i = s[i]
            l_new = l + b + (x - l - b - s_i) // HW_DIV
            b = b + (l_new - l - b) // HW_DIV
            s[i] = s_i + (x - l_new - s_i) // HW_DIV
            l = l_new
        n += 1
        last_h = h
    return l, b, n, last_h


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    load = Path("/proc/loadavg").read_text().split()[0]
    rng = np.random.default_rng(42)
    values = pd.Series(rng.uniform(0.0, 500.0, size=n))
    hs = pd.Series(np.arange(n, dtype=np.int64))
    xs = pd.Series(rng.integers(0, 10**6, size=n).astype(np.int64))

    print(f"n_rows={n} load_before={load}")
    for label, fn in (
        ("holt_forecasts (raw events/user)", lambda: holt_kernel(values)),
        ("holt_winters_monitor (hourly buckets/series)", lambda: hw_kernel(hs, xs)),
    ):
        fn()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(
            f"{label:46s} {best:6.3f}s  -> {n / best / 1e6:5.2f} M rows/s/core"
        )


if __name__ == "__main__":
    main()
