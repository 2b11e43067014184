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


def test_view_creating_queries_rerun_across_sf_dirs(spark):
    """Queries that create temp views / tmp tables / Derby DBs must be
    idempotent within one session AND correct when re-run against a
    DIFFERENT sf_dir (stale views or cached paths would leak the first
    run's data into the second)."""
    from postpy_spark.registry import load_all

    reg = load_all()
    stateful = [
        "scan_csv", "ddl_create_table_as", "sql_execute", "scan_jdbc",
        "table_versioning", "scan_xml", "scan_orc",
    ]
    def rows(name, sf):
        return sorted(map(tuple, reg[name].fn(spark, f"/root/testdata/{sf}").collect()))

    for name in stateful:
        small = rows(name, "sf0.001")
        big = rows(name, "sf0.01")
        again = rows(name, "sf0.001")
        assert small == again, name
        # nation is 25 rows at every sf; every other result must reflect
        # the sf_dir it was given, not the first run's data
        if name not in ("scan_csv", "scan_jdbc", "scan_xml"):
            assert small != big, (name, small[:3])


def test_registry_contract_invariants():
    """Driver-interface guard: the §2 contract registers first and intact,
    every oracle belongs to a registered query, no oracle is empty, and
    group tags stay within the SURVEY vocabulary."""
    from postpy_spark import registry

    reg = registry.load_all()
    names = list(reg)
    # the first 93 are exactly the §2 contract, led by the driver-sample
    # rotation (the ops with no / stale driver attestation — see registry.py)
    rot = list(registry.DRIVER_SAMPLE_ROTATION)
    assert len(set(rot)) == len(rot), "rotation has duplicates"
    assert set(rot) <= set(registry.CONTRACT_ORDER), "rotation must be contract ops"
    assert names[: len(rot)] == rot
    assert set(names[:93]) == set(registry.CONTRACT_ORDER)
    assert set(registry.CONTRACT_ORDER) <= set(names)
    for n, rq in reg.items():
        assert rq.name == n
        if rq.oracle is not None:
            assert rq.oracle.strip(), n
        assert rq.group in {"A", "B1", "B2", "B3", "B4", "B5", "B6", "C", "D", "E"}, n
    # the entry module exposes exactly the registry
    import __spark_entry__ as e

    assert set(e.queries()) == set(names)
    assert set(e.oracle_sql()) == {n for n, rq in reg.items() if rq.oracle is not None}
