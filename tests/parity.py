"""Local replica of the driver's Spark-vs-DuckDB comparison.

Driver-faithful since round 3: both sides go through **pandas** (the
driver uses ``duck_rel.df()`` / ``spark_df.toPandas()``), are
canonicalized with ``sort_values`` over all columns (which, like the
driver's ``_canon``, CRASHES on array-typed cells — see the
``op_c1_reconstruct_nested`` red row in CORRECTNESS_r02), and are
value-compared dtype-sensitively: DuckDB's HUGEINT ``sum()`` lands in
pandas as float64 and the driver's value-hash sees ``1000.0`` vs
Spark's int64 ``1000`` (the ``ext_pivot``/``ns_corpus_curation``
failure mode). Local green must imply driver green, so this harness is
at least as strict:

- int-family vs float-family dtype mismatch on the same column FAILS
  (oracles must CAST HUGEINT sums back to BIGINT);
- floats canonicalize via repr (full 17-digit round-trip — a 1-ulp
  difference FAILS, the bar functions/exact.py is built for);
- date vs timestamp cross-type FAILS (cast both sides alike);
- array/map/struct-typed columns FAIL with the same TypeError path the
  driver hits (serialize them with array_join/to_json at the edge).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd

_INT_KINDS = frozenset("iu")
_FLOAT_KINDS = frozenset("f")


def canon_cell(v) -> str:
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<null>"
        return repr(f)
    if isinstance(v, Decimal):
        return f"dec:{v}"
    # DATE columns: Spark's toPandas yields datetime.date objects while
    # DuckDB's .df() yields midnight datetime64 — the driver's canon
    # treats these as equal (op_f3_date_validation was driver-green in
    # r02 with exactly this shape), so normalize midnight timestamps to
    # the bare date.
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<null>"
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray, dict)):
        # unreachable when pandas_canon ran first (sort_values raises),
        # but keep a loud marker for direct callers
        raise TypeError(f"array/map-typed cell not driver-canonicalizable: {type(v)}")
    if v is pd.NaT:
        return "<null>"
    return str(v)


def pandas_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's `_canon`: column-sort then row-sort by all columns.

    Raises TypeError on array-typed columns exactly like the driver
    (pandas factorize on unhashable lists).
    """
    cols = sorted(pdf.columns)
    out = pdf[cols]
    if cols:
        out = out.sort_values(by=cols, kind="mergesort")
    return out.reset_index(drop=True)


def canon_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = []
    for r in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(canon_cell(v) for v in r))
    return sorted(rows)


def _dtype_family(kind: str) -> str:
    if kind in _INT_KINDS:
        return "int"
    if kind in _FLOAT_KINDS:
        return "float"
    if kind == "M":
        return "datetime"
    if kind == "b":
        return "bool"
    return "object"


def compare(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = duck_rel.df()
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"schema mismatch: spark={s_cols} duck={d_cols}")
        return problems
    if len(s_pdf) != len(d_pdf):
        problems.append(f"row count mismatch: spark={len(s_pdf)} duck={len(d_pdf)}")
    # dtype-family check: the driver's value-hash distinguishes 1000.0
    # (HUGEINT→float64) from 1000 (int64) even when values are equal
    for c in s_cols:
        sf = _dtype_family(s_pdf[c].dtype.kind)
        df_ = _dtype_family(d_pdf[c].dtype.kind)
        if {sf, df_} == {"int", "float"}:
            problems.append(
                f"dtype-family mismatch on `{c}`: spark={s_pdf[c].dtype} "
                f"duck={d_pdf[c].dtype} — CAST the oracle aggregate to BIGINT "
                f"(DuckDB HUGEINT sums land as float64 in the driver's pandas)"
            )
    try:
        s_canon = pandas_canon(s_pdf)
    except TypeError as e:
        problems.append(f"driver canon would CRASH on the Spark result: {e}")
        return problems
    try:
        d_canon = pandas_canon(d_pdf)
    except TypeError as e:
        problems.append(f"driver canon would CRASH on the oracle result: {e}")
        return problems
    if problems:
        return problems
    s_rows = canon_rows(s_canon)
    d_rows = canon_rows(d_canon)
    if s_rows != d_rows:
        d_set = set(d_rows)
        s_set = set(s_rows)
        only_s = [r for r in s_rows if r not in d_set][:5]
        only_d = [r for r in d_rows if r not in s_set][:5]
        problems.append(
            f"value mismatch\n"
            f"  cols(sorted): {s_cols}\n"
            f"  spark-only: {only_s}\n  duck-only: {only_d}"
        )
    return problems


def assert_driver_canon_safe(spark_df) -> list[str]:
    """Rows-only queries still pass through the driver's `_canon`
    (CORRECTNESS_r02's op_c1_reconstruct_nested crashed there despite
    having no oracle) — so every registered query's output must be
    pandas-sortable and cell-canonicalizable."""
    problems: list[str] = []
    pdf = spark_df.toPandas()
    try:
        canon = pandas_canon(pdf)
        canon_rows(canon)
    except TypeError as e:
        problems.append(f"driver canon would CRASH: {e}")
    return problems
