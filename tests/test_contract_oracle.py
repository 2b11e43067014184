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
    from postpy_spark.testing import nonscalar_top_level_columns

    df = REG[name].fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert df.columns
    # driver-canonicalizability guard (r9: embed_pca's array<double> column
    # crashed the driver's pandas sort — unhashable numpy cells).  Rows-only
    # outputs are STILL sorted/hashed by the driver, so the scalar rule
    # applies to every registered query, not just the sql-checked ones
    # (those get the same check via compare_spark_duckdb/tools/check.py).
    bad = nonscalar_top_level_columns(df.schema)
    assert not bad, (
        f"{name}: non-scalar top-level columns {bad} — explode to "
        "(id, pos, value) rows or array_join to a string"
    )


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


def test_status_md_counts_match_registry():
    """STATUS.md is generated (tools/status.py) but checked in — r9 shipped
    it one query stale (312 vs 313; agg_kll_quantiles missing).  Parse its
    header counts and every listed query name back out and assert parity
    with the live registry, so drift fails the pre-commit suite."""
    import pathlib
    import re

    text = (pathlib.Path(__file__).parent.parent / "STATUS.md").read_text()
    m = re.search(
        r"Registered queries: \*\*(\d+)\*\* — (\d+) DuckDB-oracle-checked, (\d+) rows-only",
        text,
    )
    assert m, "STATUS.md header counts not found — regenerate with tools/status.py"
    n_total, n_sql, n_rows = (int(g) for g in m.groups())
    assert n_total == len(REG), f"STATUS.md says {n_total}, registry has {len(REG)}"
    assert n_sql == len(SQL_CHECKED), f"STATUS.md says {n_sql} sql, registry {len(SQL_CHECKED)}"
    assert n_rows == len(ROWS_ONLY), f"STATUS.md says {n_rows} rows-only, registry {len(ROWS_ONLY)}"
    listed = set(re.findall(r"\| \d+ \| `([a-z0-9_]+)` \|", text))
    assert listed == set(REG), (
        f"STATUS.md missing {sorted(set(REG) - listed)}, "
        f"stale {sorted(listed - set(REG))}"
    )
    # README's "Current gate" headline drifts the same way — pin it too
    readme = (pathlib.Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(
        r"\*\*(\d+) registered queries — (\d+) sql-checked pass / 0 fail at\n"
        r"sf0\.01 \(also verified at sf0\.001 and sf0\.1\) — plus (\d+) rows-only\*\*",
        readme,
    )
    assert m, "README.md 'Current gate' counts not found"
    assert tuple(int(g) for g in m.groups()) == (
        len(REG),
        len(SQL_CHECKED),
        len(ROWS_ONLY),
    ), f"README.md gate counts {m.groups()} != registry ({len(REG)}, {len(SQL_CHECKED)}, {len(ROWS_ONLY)})"


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
    assert set(rot) <= set(names), "rotation must be registered queries"
    assert names[: len(rot)] == rot
    # every contract op registers, and all of them sit directly after the
    # rotation prefix (rotation may include extras the driver has never
    # sampled — the contract itself was fully attested over rounds 1-5)
    assert set(registry.CONTRACT_ORDER) <= set(names)
    n_lead = len(set(rot) | set(registry.CONTRACT_ORDER))
    assert set(names[:n_lead]) == set(rot) | set(registry.CONTRACT_ORDER)
    for n, rq in reg.items():
        assert rq.name == n
        if rq.oracle is not None:
            assert rq.oracle.strip(), n
        assert rq.group in {"A", "B1", "B2", "B3", "B4", "B5", "B6", "C", "D", "E"}, n
    # the entry module exposes exactly the registry
    import __spark_entry__ as e

    assert set(e.queries()) == set(names)
    assert set(e.oracle_sql()) == {n for n, rq in reg.items() if rq.oracle is not None}


def test_type_parity_detector():
    """The gate must flag DuckDB int128/decimal widths that Spark can't
    produce — the class behind the round-4 driver hash fails, invisible to
    value comparison because canon() collapses int width."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from postpy_spark.testing import type_parity_errors

    schema = StructType(
        [StructField("total", LongType()), StructField("avg", DoubleType())]
    )
    assert type_parity_errors(schema, {"total": "BIGINT", "avg": "DOUBLE"}) == []
    # DuckDB SUM(BIGINT) -> HUGEINT: must fail even though values compare equal
    assert type_parity_errors(schema, {"total": "HUGEINT", "avg": "DOUBLE"})
    # nested int128 (e.g. list_sum results inside arrays) is flagged too
    assert type_parity_errors(schema, {"total": "HUGEINT[]", "avg": "DOUBLE"})
    # numeric-family mismatch: DECIMAL oracle vs double Spark column
    assert type_parity_errors(schema, {"total": "BIGINT", "avg": "DECIMAL(18,2)"})
    # DECIMAL oracle vs integer Spark column (round-6 ADVICE gap)
    assert type_parity_errors(schema, {"total": "DECIMAL(18,2)", "avg": "DOUBLE"})


def test_type_parity_bans_decimal_outright():
    """Round-6 driver lesson (agg_decimal_exact): DECIMAL-on-BOTH-sides still
    hash-fails at the driver (DuckDB int64 vs Spark int128 physical payloads,
    invisible to DESCRIBE), so the gate rejects ANY top-level DECIMAL — the
    exact pre-fix agg_decimal_exact shape must now fail the gate."""
    from pyspark.sql.types import DecimalType, LongType, StructField, StructType

    from postpy_spark.testing import type_parity_errors

    # pre-fix shape: DECIMAL(18,2) on both engines, identical DESCRIBE output
    schema = StructType(
        [StructField("exact_total", DecimalType(18, 2)), StructField("n", LongType())]
    )
    errs = type_parity_errors(schema, {"exact_total": "DECIMAL(18,2)", "n": "BIGINT"})
    assert len(errs) == 1 and "DECIMAL is banned" in errs[0]
    # post-fix shape (BIGINT cents) is clean
    schema_ok = StructType(
        [StructField("exact_total_cents", LongType()), StructField("n", LongType())]
    )
    assert (
        type_parity_errors(schema_ok, {"exact_total_cents": "BIGINT", "n": "BIGINT"})
        == []
    )


def test_type_parity_catches_prefixed_sum(duck):
    """End-to-end: the exact pre-fix text_stats oracle shape (bare SUM of an
    integer column) is caught by DESCRIBE-based parity before any rows are
    compared."""
    from pyspark.sql.types import LongType, StructField, StructType

    from postpy_spark.testing import type_parity_errors

    bad_sql = "SELECT CAST(SUM(n_chars) AS BIGINT) AS ok, SUM(n_chars) AS bad FROM documents"
    d_types = {r[0]: r[1] for r in duck.execute("DESCRIBE " + bad_sql).fetchall()}
    schema = StructType(
        [StructField("ok", LongType()), StructField("bad", LongType())]
    )
    errs = type_parity_errors(schema, d_types)
    assert len(errs) == 1 and "bad" in errs[0]
