"""Declarative schema model + DDL compilation + type/encoding maps.

postpy analogs [U] (SURVEY.md §2.A):
- ``postpy/base.py``: ``Database``/``Schema``/``Table``/``Column``/
  ``PrimaryKey`` entities with ``create_statement()``/``drop_statement()``
  → the dataclasses below, compiling to Spark SQL DDL instead of PG DDL.
- ``postpy/data_types.py``: Python↔PostgreSQL type mapping → ``PG_TYPE_MAP``
  (PostgreSQL type name → Spark SQL type), used by DDL compile and JDBC
  ingestion.
- ``postpy/pg_encodings.py::get_postgres_encoding``: Python codec → PG
  encoding name → ``get_postgres_encoding`` below (same surface), plus the
  inverse used to pass encodings to Spark's CSV reader.

Primary keys are not enforceable in Spark; we record them as an
informational table property (``postpy.primary_key``) so reflection
(:mod:`postpy_spark.etl`) can surface them like postpy's
``get_primary_keys`` does.
"""

from __future__ import annotations

import encodings
from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# PostgreSQL type name → Spark SQL DDL type (postpy data_types.py parity)
# ---------------------------------------------------------------------------

PG_TYPE_MAP: dict[str, str] = {
    "smallint": "SMALLINT",
    "int2": "SMALLINT",
    "integer": "INT",
    "int": "INT",
    "int4": "INT",
    "bigint": "BIGINT",
    "int8": "BIGINT",
    "serial": "INT",
    "bigserial": "BIGINT",
    "real": "FLOAT",
    "float4": "FLOAT",
    "double precision": "DOUBLE",
    "float8": "DOUBLE",
    "numeric": "DECIMAL(38,18)",
    "decimal": "DECIMAL(38,18)",
    "money": "DECIMAL(19,2)",
    "text": "STRING",
    "varchar": "STRING",
    "character varying": "STRING",
    "char": "STRING",
    "character": "STRING",
    "uuid": "STRING",
    "boolean": "BOOLEAN",
    "bool": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP_NTZ",
    "timestamp without time zone": "TIMESTAMP_NTZ",
    "timestamptz": "TIMESTAMP",
    "timestamp with time zone": "TIMESTAMP",
    "time": "STRING",
    "interval": "INTERVAL DAY TO SECOND",
    "bytea": "BINARY",
    "json": "STRING",
    "jsonb": "STRING",
    "xml": "STRING",
    "inet": "STRING",
    "cidr": "STRING",
    "macaddr": "STRING",
}

_SPARK_TYPE_FOR_DDL: dict[str, T.DataType] = {
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "TIMESTAMP_NTZ": T.TimestampNTZType(),
    "BINARY": T.BinaryType(),
}


def pg_to_spark_type(pg_type: str) -> str:
    """Map a PostgreSQL type name (as written in postpy Column defs) to a
    Spark SQL DDL type.  Parameterized numerics keep their precision."""
    t = pg_type.strip().lower()
    if t.startswith(("numeric(", "decimal(")):
        return "DECIMAL" + t[t.index("(") :].upper()
    if t.startswith(("varchar(", "character varying(", "char(", "character(")):
        return "STRING"
    if t not in PG_TYPE_MAP:
        raise KeyError(f"unsupported PostgreSQL type: {pg_type!r}")
    return PG_TYPE_MAP[t]


# ---------------------------------------------------------------------------
# Encoding map (postpy pg_encodings.py parity)
# ---------------------------------------------------------------------------

#: Python codec (normalized) → PostgreSQL encoding name.
PG_ENCODING_MAP: dict[str, str] = {
    "utf_8": "UTF8",
    "ascii": "SQL_ASCII",
    "latin_1": "LATIN1",
    "iso8859_2": "LATIN2",
    "iso8859_5": "ISO_8859_5",
    "iso8859_6": "ISO_8859_6",
    "iso8859_7": "ISO_8859_7",
    "iso8859_8": "ISO_8859_8",
    "iso8859_9": "LATIN5",
    "iso8859_15": "LATIN9",
    "cp1250": "WIN1250",
    "cp1251": "WIN1251",
    "cp1252": "WIN1252",
    "cp1256": "WIN1256",
    "euc_jp": "EUC_JP",
    "euc_kr": "EUC_KR",
    "gb2312": "EUC_CN",
    "big5": "BIG5",
    "gbk": "GBK",
    "shift_jis": "SJIS",
    "utf_16": "UTF8",  # PG has no UTF16 server encoding; transcode to UTF8
}


def get_postgres_encoding(python_encoding: str) -> str:
    """Python codec name → PostgreSQL encoding name (upstream
    ``pg_encodings.py::get_postgres_encoding`` surface [U])."""
    normalized = encodings.normalize_encoding(python_encoding).lower()
    normalized = encodings.aliases.aliases.get(normalized, normalized)
    if normalized not in PG_ENCODING_MAP:
        raise LookupError(f"unsupported encoding: {python_encoding!r}")
    return PG_ENCODING_MAP[normalized]


# ---------------------------------------------------------------------------
# Entity model (postpy base.py parity)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Column:
    """A column declaration; ``data_type`` accepts PostgreSQL or Spark SQL
    type names (postpy users write PG names)."""

    name: str
    data_type: str
    nullable: bool = True

    @property
    def spark_type(self) -> str:
        try:
            return pg_to_spark_type(self.data_type)
        except KeyError:
            return self.data_type.upper()  # already a Spark SQL type

    def to_field(self) -> T.StructField:
        ddl = self.spark_type
        dt = _SPARK_TYPE_FOR_DDL.get(ddl)
        if dt is None:
            dt = T._parse_datatype_string(ddl)
        return T.StructField(self.name, dt, self.nullable)

    def ddl(self) -> str:
        return f"{self.name} {self.spark_type}" + ("" if self.nullable else " NOT NULL")


@dataclass(frozen=True)
class PrimaryKey:
    columns: tuple[str, ...]

    def __init__(self, columns) -> None:
        object.__setattr__(self, "columns", tuple(columns))


@dataclass
class Table:
    """Qualified table declaration compiling to Spark SQL DDL (upstream
    ``base.py::Table.create_statement`` [U])."""

    name: str
    columns: list[Column]
    schema: str | None = None  # namespace
    primary_key: PrimaryKey | None = field(default=None)
    location: str | None = None
    format: str = "parquet"

    @property
    def qualified_name(self) -> str:
        return f"{self.schema}.{self.name}" if self.schema else self.name

    def to_struct_type(self) -> T.StructType:
        return T.StructType([c.to_field() for c in self.columns])

    def create_statement(self, if_not_exists: bool = False) -> str:
        cols = ",\n  ".join(c.ddl() for c in self.columns)
        ine = "IF NOT EXISTS " if if_not_exists else ""
        stmt = f"CREATE TABLE {ine}{self.qualified_name} (\n  {cols}\n) USING {self.format}"
        props = []
        if self.primary_key:
            # Informational only — Spark does not enforce PKs; reflection
            # surfaces it (postpy get_primary_keys parity).
            props.append(
                f"'postpy.primary_key' = '{','.join(self.primary_key.columns)}'"
            )
        if props:
            stmt += f"\nTBLPROPERTIES ({', '.join(props)})"
        if self.location:
            stmt += f"\nLOCATION '{self.location}'"
        return stmt

    def drop_statement(self, if_exists: bool = True) -> str:
        ie = "IF EXISTS " if if_exists else ""
        return f"DROP TABLE {ie}{self.qualified_name}"
