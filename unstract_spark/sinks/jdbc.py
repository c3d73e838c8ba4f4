"""D2 — database sink with dynamic schema-on-write DDL, 8 dialects.

The reference creates destination tables lazily from the first row's
Python value types, with per-dialect type maps and two column modes
(reference: backend/workflow_manager/endpoint_v2/database_utils.py:83-186
column synthesis, 276-305 DDL, 308-336 v2 migration; dialect maps e.g.
unstract/connectors/databases/postgresql/postgresql.py:84-107, BigQuery
PARSE_JSON rewriting bigquery.py:136-159).

Spark-first: the engine derives the DDL from the DataFrame *schema*
(plan-time, not first-row sniffing), emits dialect-correct
CREATE TABLE / ALTER TABLE, executes it over a driver-side JDBC
connection, then streams rows through df.write.jdbc(mode='append').
SQL generation is pure and unit-testable without drivers (mirrors the
reference's dialect-matrix test suites
endpoint_v2/tests/destination-connectors/test_destination_connector_*.py);
the full write path is integration-tested against embedded Derby.

Scale: df.write.jdbc parallelizes one connection per partition;
`numPartitions` bounds destination connection fan-in; rows stream
batched (batchsize option). Snowflake/BigQuery at real scale use their
native Spark connectors instead of JDBC — the DDL maps stay the same.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Permanent columns the reference adds to every destination table
# (reference: endpoint_v2/constants.py:11-19).
PERMANENT_COLUMNS: dict[str, T.DataType] = {
    "id": T.StringType(),
    "created_by": T.StringType(),
    "created_at": T.TimestampType(),
    "metadata": T.StringType(),  # JSON
    "error_message": T.StringType(),
    "status": T.StringType(),
}

# dialect -> (Spark type -> column type). JSON-ish Spark types (struct/
# array/map) take the dialect's document type, like the reference's
# dict/list handling.
_DIALECT_TYPES: dict[str, dict[str, str]] = {
    "postgresql": {
        "string": "TEXT", "long": "BIGINT", "int": "INTEGER", "double": "DOUBLE PRECISION",
        "boolean": "BOOLEAN", "timestamp": "TIMESTAMP", "binary": "BYTEA", "json": "JSONB",
    },
    "mysql": {
        "string": "LONGTEXT", "long": "BIGINT", "int": "INT", "double": "DOUBLE",
        "boolean": "BOOLEAN", "timestamp": "TIMESTAMP", "binary": "LONGBLOB", "json": "JSON",
    },
    "mariadb": {
        "string": "LONGTEXT", "long": "BIGINT", "int": "INT", "double": "DOUBLE",
        "boolean": "BOOLEAN", "timestamp": "TIMESTAMP", "binary": "LONGBLOB", "json": "LONGTEXT",
    },
    "mssql": {
        "string": "NVARCHAR(MAX)", "long": "BIGINT", "int": "INT", "double": "FLOAT",
        "boolean": "BIT", "timestamp": "DATETIME2", "binary": "VARBINARY(MAX)",
        "json": "NVARCHAR(MAX)",
    },
    "oracle": {
        "string": "CLOB", "long": "NUMBER(19)", "int": "NUMBER(10)", "double": "BINARY_DOUBLE",
        "boolean": "NUMBER(1)", "timestamp": "TIMESTAMP", "binary": "BLOB", "json": "CLOB",
    },
    "redshift": {
        "string": "VARCHAR(65535)", "long": "BIGINT", "int": "INTEGER", "double": "DOUBLE PRECISION",
        "boolean": "BOOLEAN", "timestamp": "TIMESTAMP", "binary": "VARBYTE", "json": "SUPER",
    },
    "snowflake": {
        "string": "VARCHAR", "long": "NUMBER(19,0)", "int": "NUMBER(10,0)", "double": "DOUBLE",
        "boolean": "BOOLEAN", "timestamp": "TIMESTAMP_NTZ", "binary": "BINARY",
        "json": "VARIANT",
    },
    "bigquery": {
        "string": "STRING", "long": "INT64", "int": "INT64", "double": "FLOAT64",
        "boolean": "BOOL", "timestamp": "TIMESTAMP", "binary": "BYTES", "json": "JSON",
    },
    # Apache Derby — the embeddable dialect the integration test runs
    # against (Derby jars ship inside Spark's jars/ directory).
    # string/json are CLOB because Spark's DerbyDialect binds StringType
    # as java.sql.Types.CLOB — setNull(CLOB) into a VARCHAR column is a
    # Derby 22005 type error, so the table must agree with the writer.
    "derby": {
        "string": "CLOB", "long": "BIGINT", "int": "INTEGER", "double": "DOUBLE",
        "boolean": "BOOLEAN", "timestamp": "TIMESTAMP", "binary": "BLOB",
        "json": "CLOB",
    },
}

DIALECTS = tuple(_DIALECT_TYPES)

# Dialects whose DDL accepts CREATE TABLE IF NOT EXISTS. MSSQL, Oracle
# (<23c) and Derby do not — there the writer issues a plain CREATE TABLE
# and swallows the duplicate-table error (Derby SQLState X0Y32).
_SUPPORTS_IF_NOT_EXISTS = frozenset(
    {"postgresql", "mysql", "mariadb", "redshift", "snowflake", "bigquery"}
)


def _type_key(dt: T.DataType) -> str:
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType, T.VariantType)):
        return "json"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.TimestampType, T.DateType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return "string"


def _quote_ident(name: str, dialect: str) -> str:
    # conservative identifier validation mirrors the reference's
    # sql_safety module: letters/digits/underscore only, else reject
    if not name or not all(c.isalnum() or c == "_" for c in name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    if dialect in ("mysql", "mariadb", "bigquery"):
        return f"`{name}`"
    if dialect == "mssql":
        return f"[{name}]"
    return f'"{name}"'


def column_type(dt: T.DataType, dialect: str) -> str:
    return _DIALECT_TYPES[dialect][_type_key(dt)]


@dataclass
class TableSpec:
    """Destination-table layout, from a DataFrame schema + column mode."""

    table: str
    dialect: str
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, sql_type)

    def create_table_sql(self) -> str:
        cols = ", ".join(
            f"{_quote_ident(n, self.dialect)} {t}" for n, t in self.columns
        )
        exists = "IF NOT EXISTS " if self.dialect in _SUPPORTS_IF_NOT_EXISTS else ""
        return (
            f"CREATE TABLE {exists}{_quote_ident(self.table, self.dialect)} ({cols})"
        )

    def migration_sql(self, existing_cols: set[str]) -> list[str]:
        """ALTER TABLE ADD for columns the live table is missing —
        the reference's in-place v2 migration (database_utils.py:308-336)."""
        stmts = []
        for n, t in self.columns:
            if n not in existing_cols:
                stmts.append(
                    f"ALTER TABLE {_quote_ident(self.table, self.dialect)} "
                    f"ADD COLUMN {_quote_ident(n, self.dialect)} {t}"
                )
        return stmts


def build_table_spec(
    df: DataFrame,
    table: str,
    dialect: str,
    mode: str = "split",  # "split" | "single_json"
    json_column: str = "data",
) -> TableSpec:
    """Derive the destination layout from the result DataFrame schema.

    split: one column per field (reference SPLIT_JSON_INTO_COLUMNS);
    single_json: whole row into one JSON doc column plus a `_v2` twin
    (reference WRITE_JSON_TO_A_SINGLE_COLUMN, database_utils.py:166-182).
    Permanent columns always present.
    """
    if dialect not in _DIALECT_TYPES:
        raise ValueError(f"unknown dialect {dialect!r}; have {DIALECTS}")
    cols: list[tuple[str, str]] = [
        (n, column_type(t, dialect)) for n, t in PERMANENT_COLUMNS.items()
    ]
    if mode == "single_json":
        json_t = _DIALECT_TYPES[dialect]["json"]
        cols += [(json_column, json_t), (f"{json_column}_v2", json_t)]
    else:
        for f_ in df.schema.fields:
            if f_.name in PERMANENT_COLUMNS:
                continue
            cols.append((f_.name, column_type(f_.dataType, dialect)))
    return TableSpec(table=table, dialect=dialect, columns=cols)


def prepare_rows(
    df: DataFrame,
    mode: str = "split",
    json_column: str = "data",
    created_by: str = "unstract_spark",
) -> DataFrame:
    """Attach permanent columns; in single_json mode fold the payload
    into one JSON string column (to_json(struct(*)))."""
    payload_cols = [c for c in df.columns if c not in PERMANENT_COLUMNS]
    out = df
    if mode == "single_json":
        # status/error_message ride along outside the JSON payload so an
        # ERROR row keeps its label in the destination (split mode keeps
        # them naturally; dropping them here mislabeled errors COMPLETED)
        carried = [c for c in ("status", "error_message") if c in df.columns]
        out = out.withColumn(json_column, F.to_json(F.struct(*payload_cols)))
        out = out.withColumn(f"{json_column}_v2", F.col(json_column))
        out = out.select(json_column, f"{json_column}_v2", *carried)
    return (
        out.withColumn("id", F.expr("uuid()"))
        .withColumn("created_by", F.lit(created_by))
        .withColumn("created_at", F.current_timestamp())
        .withColumn("metadata", F.lit(None).cast("string"))
        .withColumn(
            "error_message",
            F.col("error_message") if "error_message" in out.columns else F.lit(None).cast("string"),
        )
        .withColumn(
            "status",
            F.col("status") if "status" in out.columns else F.lit("COMPLETED"),
        )
    )


def insert_sql(spec: TableSpec, columns: list[str]) -> str:
    """Parameterized INSERT for the spec's dialect.

    Mirrors the reference's per-dialect insert rewrites
    (database_utils.py:231-267): BigQuery wraps JSON columns in
    PARSE_JSON(?), Snowflake routes VARIANT through
    INSERT ... SELECT PARSE_JSON(?) (plain VALUES cannot produce
    VARIANT there), everything else is plain VALUES with ? params.
    """
    types = dict(spec.columns)
    q = lambda n: _quote_ident(n, spec.dialect)  # noqa: E731
    col_list = ", ".join(q(c) for c in columns)
    json_type = _DIALECT_TYPES[spec.dialect]["json"]

    def param(col: str) -> str:
        is_json = types.get(col) == json_type and json_type in ("JSON", "VARIANT", "JSONB", "SUPER")
        if spec.dialect == "bigquery" and is_json:
            return "PARSE_JSON(?)"
        if spec.dialect == "snowflake" and is_json:
            return "PARSE_JSON(?)"
        return "?"

    params = ", ".join(param(c) for c in columns)
    if spec.dialect == "snowflake" and any(param(c) != "?" for c in columns):
        return f"INSERT INTO {q(spec.table)} ({col_list}) SELECT {params}"
    return f"INSERT INTO {q(spec.table)} ({col_list}) VALUES ({params})"


def execute_ddl(
    spark,
    url: str,
    statements: list[str],
    properties: dict[str, str] | None = None,
    ignore_existing: bool = True,
) -> None:
    """Run DDL against the destination over a driver-side JDBC
    connection (py4j -> java.sql.DriverManager).

    Spark's own `createTableColumnTypes` option is parsed as *Spark SQL*
    types, so dialect-native types (JSONB, NVARCHAR(MAX), VARIANT, ...)
    would throw ParseException — the table must be created with our DDL
    before df.write.jdbc(mode='append') streams rows into it.
    """
    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    if "driver" in (properties or {}):
        jvm.java.lang.Class.forName(properties["driver"])
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            for sql in statements:
                try:
                    stmt.execute(sql)
                except Exception as e:  # py4j Py4JJavaError
                    msg = str(e)
                    if ignore_existing and (
                        "X0Y32" in msg or "already exists" in msg.lower()
                    ):
                        continue
                    raise
        finally:
            stmt.close()
    finally:
        conn.close()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    dialect: str,
    mode: str = "split",
    properties: dict[str, str] | None = None,
    num_partitions: int = 8,
    ensure_table: bool = True,
) -> TableSpec:
    """Write through Spark's JDBC sink into a table created with the
    dialect's own DDL.

    The table is created first via `execute_ddl` (dialect-native column
    types; Spark's createTableColumnTypes can't express them), then rows
    append through df.write.jdbc against the *quoted* table name so the
    case-sensitive identifiers in our DDL resolve. numPartitions bounds
    connection fan-in to the destination.
    """
    spec = build_table_spec(df, table, dialect, mode)
    if ensure_table:
        execute_ddl(df.sparkSession, url, [spec.create_table_sql()], properties)
    qtable = _quote_ident(table, dialect)
    (
        prepare_rows(df, mode)
        .repartition(num_partitions)
        .write.jdbc(url, qtable, mode="append", properties=properties or {})
    )
    return spec
