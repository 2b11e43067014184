"""Test-support helpers (postpy's ``fixtures.py`` analog [U], SURVEY.md §2.A).

Provides the canonical-form comparison used by ``tools/check.py`` and the
pytest suite: the same multiset-of-rows equivalence the driver's
order-insensitive value-hash implies, computed with exact values so it is
strictly stronger.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from postpy_spark.io import TABLES


def canon(v):
    """Canonicalize a cell value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def canon_rows(cols: list[str], rows) -> tuple[list[str], list]:
    """Sort columns by name, canonicalize every cell, sort rows — the
    order-insensitive canonical form of a result set."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)
    return sorted_cols, out


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with all testdata tables registered as views —
    mirrors the driver's oracle environment."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def nonscalar_top_level_columns(spark_schema) -> list[str]:
    """Names of top-level columns the DRIVER's canonicalizer cannot hash.

    The driver sorts result rows with ``pandas.sort_values`` before
    hashing; an ``array``/``map``/``struct`` cell arrives as a numpy
    array / dict / Row — unhashable, so the whole query records as a
    driver FAILURE even when the values are right (round 9: ``embed_pca``
    was the only red row for exactly this).  Rule, mirroring the
    DECIMAL ban: NO registered query may expose a non-scalar top-level
    column — explode to ``(id, pos, value)`` rows or ``array_join`` to a
    string instead.  Enforced for every query (sql-checked AND
    rows-only) in tools/check.py and tests/test_contract_oracle.py."""
    return [
        f.name
        for f in spark_schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


def type_parity_errors(spark_schema, duck_types: dict[str, str]) -> list[str]:
    """Cross-engine hash-type parity between a Spark schema and DuckDB
    ``DESCRIBE <oracle>`` column types.

    The driver's value-hash is width-sensitive: DuckDB ``SUM(BIGINT)``
    returns HUGEINT (int128) which hashes differently from Spark's BIGINT
    even though the values compare equal as Python ints — ``canon()``
    collapses the width, so the value diff can NEVER catch this class
    (round 4 shipped two driver hash fails exactly this way).  Rules:

    - HUGEINT/UHUGEINT anywhere in a DuckDB column type is always an error;
      fix the oracle with ``CAST(... AS BIGINT)``.
    - ANY top-level DECIMAL column (either engine) is an error: round 6
      proved DECIMAL payloads hash differently across engines even when
      DESCRIBE shows the identical logical type on both sides (DuckDB's
      int64 vs Spark's int128 physical decimal width — invisible to any
      type- or value-level compare).  Re-express exact money as BIGINT
      cents, or ROUND to double.
    - Top-level numeric-family mismatch (decimal vs float vs integer, any
      direction) is an error.
    """
    errs: list[str] = []
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    _INT_DU = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "INT", "UBIGINT",
               "UINTEGER", "USMALLINT", "UTINYINT")
    _INT_ST = ("tinyint", "smallint", "int", "bigint", "long", "short", "byte")
    for col, dt in duck_types.items():
        du = dt.upper()
        st = spark_types.get(col, "")
        if "HUGEINT" in du:
            errs.append(
                f"{col}: duckdb {dt} (int128) vs spark {st} — "
                "CAST the oracle to BIGINT"
            )
            continue
        d_fam = (
            "decimal"
            if du.startswith("DECIMAL")
            else "float"
            if du in ("DOUBLE", "FLOAT", "REAL")
            else "int" if du in _INT_DU else None
        )
        s_fam = (
            "decimal"
            if st.startswith("decimal")
            else "float"
            if st in ("double", "float")
            else "int" if st in _INT_ST else None
        )
        if d_fam == "decimal" or s_fam == "decimal":
            errs.append(
                f"{col}: duckdb {dt} vs spark {st} — DECIMAL is banned from "
                "hashed oracle output (physical-width hash mismatch class); "
                "use BIGINT cents or ROUND(...) double"
            )
            continue
        if d_fam and s_fam and d_fam != s_fam:
            errs.append(f"{col}: duckdb {dt} vs spark {st} — numeric family mismatch")
    return errs


def compare_spark_duckdb(df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = equivalent)."""
    bad_cols = nonscalar_top_level_columns(df.schema)
    if bad_cols:
        return [
            f"non-scalar top-level columns {bad_cols} — driver "
            "canonicalizer cannot hash array/map/struct cells"
        ]
    t_errs = type_parity_errors(
        df.schema,
        {r[0]: r[1] for r in con.execute("DESCRIBE " + sql).fetchall()},
    )
    if t_errs:
        return ["type parity: " + "; ".join(t_errs)]
    s_cols, s_rows = canon_rows(df.columns, df.collect())
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    d_cols, d_rows = canon_rows(d_cols, d_rows)
    problems = []
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duckdb={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
        return problems
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        problems.append(f"values differ, first diffs: {diffs}")
    return problems


def record_margin(
    query: str,
    gate: str,
    measured: float,
    bound: float,
    direction: str = ">=",
) -> None:
    """Rows-only margin telemetry (r7 verdict item 6).

    The 32 rows-only queries are pytest-gated (recall floors, sketch
    error bands, closed-form references), but HOW MUCH headroom each gate
    has is only visible inside test internals.  Gate tests call this at
    their quantitative assertion site; it is a no-op unless
    ``PP_MARGIN_OUT`` is set (tools/rows_only_report.py sets it and runs
    the gate subset), so normal pytest runs pay nothing.

    ``direction``: ">=" means measured must stay >= bound (recall
    floors; margin = measured - bound), "<=" means measured must stay
    <= bound (error bands; margin = bound - measured).  Margin > 0 is
    headroom; a margin near 0 is a gate about to flake.
    """
    import json as _json
    import os as _os

    path = _os.environ.get("PP_MARGIN_OUT")
    if not path:
        return
    margin = (measured - bound) if direction == ">=" else (bound - measured)
    with open(path, "a") as f:
        f.write(
            _json.dumps(
                {
                    "query": query,
                    "gate": gate,
                    "measured": round(float(measured), 6),
                    "bound": round(float(bound), 6),
                    "direction": direction,
                    "margin": round(float(margin), 6),
                }
            )
            + "\n"
        )
