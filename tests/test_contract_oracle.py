"""Every sql-checkable registered query must match its DuckDB oracle at
sf0.001 (the fast tier; the driver re-checks at sf0.01)."""

import pytest

from postpy_spark import registry
from tests.conftest import SF_SMOKE

REG = registry.load_all()
SQL_CHECKED = sorted(n for n, rq in REG.items() if rq.oracle is not None)
ROWS_ONLY = sorted(n for n, rq in REG.items() if rq.oracle is None)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_match(spark, duck, name):
    from postpy_spark.testing import compare_spark_duckdb

    rq = REG[name]
    df = rq.fn(spark, SF_SMOKE)
    problems = compare_spark_duckdb(df, duck, rq.oracle)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = REG[name].fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
