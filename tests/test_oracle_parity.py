"""The main correctness gate: every oracle-backed query must match DuckDB
bit-for-bit at sf0.01 — the same comparison the driver runs."""

from __future__ import annotations

import pytest

from adv_big_data_indexing_spark.contract import registry
from tests.conftest import SF_CORRECTNESS
from tests.parity import compare

SPECS = sorted(registry().items())


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is not None])
def test_oracle_parity(spark, duck, name):
    spec = registry()[name]
    sdf = spec.fn(spark, SF_CORRECTNESS)
    rel = duck.execute(spec.oracle)
    problems = compare(sdf, rel)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is None])
def test_rows_only(spark, name):
    from tests.parity import assert_driver_canon_safe

    spec = registry()[name]
    sdf = spec.fn(spark, SF_CORRECTNESS)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
    problems = assert_driver_canon_safe(sdf)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"c_custkey", "n_urgent", "urgent_orders"} <= set(df.columns)
