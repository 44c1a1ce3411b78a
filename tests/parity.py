"""Local replica of the driver's Spark-vs-DuckDB comparison.

Row-count + schema (column-name) + order-insensitive value comparison.
Values are canonicalized to strings: floats via repr (full 17-digit
round-trip, so a 1-ulp difference FAILS — the bar the bit-deterministic
recipes in functions/exact.py are built for), timestamps via isoformat,
decimals via str.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.bool_):
            return str(bool(v))
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return canon_cell(float(v))
        if isinstance(v, np.ndarray):
            return canon_cell(list(v))
    except ImportError:
        pass
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    d_cols = [d[0] for d in duck_rel.description]
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = duck_rel.fetchall()
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")
    s_canon = canon_rows(s_cols, s_rows)
    d_canon = canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        only_s = [r for r in s_canon if r not in set(d_canon)][:5]
        only_d = [r for r in d_canon if r not in set(s_canon)][:5]
        problems.append(
            f"value mismatch ({len(only_s)}+ spark-only / {len(only_d)}+ duck-only shown)\n"
            f"  cols(sorted): {sorted(s_cols)}\n"
            f"  spark-only: {only_s}\n  duck-only: {only_d}"
        )
    return problems
