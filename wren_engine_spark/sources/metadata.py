"""Per-backend metadata normalization.

The reference scrapes live table/column/constraint metadata per data
source and maps every backend's native type names onto one portable
column-type enum (ibis-server/app/model/metadata/<backend>.py, one
module per backend; the enum is dto.py:RustWrenEngineColumnType). This
module is the Spark-side equivalent for the backends a Spark deployment
federates with over JDBC / external catalogs:

- ``normalize_type(backend, raw)``: backend type name -> portable type,
  handling parametrized spellings (``numeric(10,2)``), array notations
  (postgres ``_int4`` / ``int4[]``, BigQuery ``ARRAY<...>``), and
  unsigned/width suffixes (mysql ``int unsigned``).
- ``normalize_tables(tables, backend)``: post-processor for
  ``SourceRegistry.jdbc_metadata`` output — same table-DTO shape in,
  portable column types out.
- ``build_nested_columns(rows)``: BigQuery's INFORMATION_SCHEMA
  COLUMN_FIELD_PATHS rows (``field_path`` like ``addr.city``) -> the
  nested-column tree the reference builds for STRUCT columns
  (bigquery.py:158-186): children attach to their dotted-path parent.

Metadata is catalog-sized (thousands of rows, driver-side); no Spark
job is involved, so plain Python is the right tool here.
"""

from __future__ import annotations

import re

# Portable column types (the reference's enum, as plain strings — the
# serving layer emits JSON, so an Enum class adds nothing here).
BOOL = "BOOL"
TINYINT = "TINYINT"
SMALLINT = "SMALLINT"
INTEGER = "INTEGER"
BIGINT = "BIGINT"
DECIMAL = "DECIMAL"
REAL = "REAL"
DOUBLE = "DOUBLE"
CHAR = "CHAR"
VARCHAR = "VARCHAR"
TEXT = "TEXT"
STRING = "STRING"
DATE = "DATE"
TIME = "TIME"
TIMESTAMP = "TIMESTAMP"
TIMESTAMPTZ = "TIMESTAMPTZ"
INTERVAL = "INTERVAL"
JSON = "JSON"
BYTEA = "BYTEA"
UUID = "UUID"
ARRAY = "ARRAY"
STRUCT = "STRUCT"
MAP = "MAP"
GEOMETRY = "GEOMETRY"
GEOGRAPHY = "GEOGRAPHY"
UNKNOWN = "UNKNOWN"

_COMMON = {
    "boolean": BOOL, "bool": BOOL,
    "tinyint": TINYINT, "smallint": SMALLINT, "int2": SMALLINT,
    "int": INTEGER, "integer": INTEGER, "int4": INTEGER,
    "bigint": BIGINT, "int8": BIGINT,
    "decimal": DECIMAL, "numeric": DECIMAL,
    "real": REAL, "float4": REAL,
    "double": DOUBLE, "double precision": DOUBLE, "float8": DOUBLE,
    "char": CHAR, "character": CHAR, "bpchar": CHAR, "nchar": CHAR,
    "varchar": VARCHAR, "character varying": VARCHAR, "nvarchar": VARCHAR,
    "text": TEXT, "string": STRING,
    "date": DATE, "time": TIME,
    "timestamp": TIMESTAMP, "datetime": TIMESTAMP,
    "timestamp without time zone": TIMESTAMP,
    "timestamptz": TIMESTAMPTZ, "timestamp with time zone": TIMESTAMPTZ,
    "interval": INTERVAL,
    "json": JSON, "jsonb": JSON,
    "uuid": UUID,
    "array": ARRAY, "struct": STRUCT, "row": STRUCT, "map": MAP,
    "geometry": GEOMETRY, "geography": GEOGRAPHY,
}

# Backend-specific spellings layered over the common core. Sources:
# each engine's public type documentation; semantic parity with the
# reference's per-backend *_TYPE_MAPPING tables.
TYPE_MAPPINGS: dict[str, dict[str, str]] = {
    "postgres": {
        "name": CHAR, "bytea": BYTEA, "inet": VARCHAR, "oid": INTEGER,
        "serial": INTEGER, "bigserial": BIGINT, "money": DECIMAL,
        "xml": TEXT,
    },
    "mysql": {
        "mediumint": INTEGER, "year": SMALLINT,
        "float": REAL, "double": DOUBLE,
        "tinytext": TEXT, "mediumtext": TEXT, "longtext": TEXT,
        "blob": BYTEA, "tinyblob": BYTEA, "mediumblob": BYTEA,
        "longblob": BYTEA, "binary": BYTEA, "varbinary": BYTEA,
        "bit": BOOL, "enum": VARCHAR, "set": VARCHAR,
    },
    "bigquery": {
        # BQ spells everything upper-case; lookup is lowercased
        "int64": BIGINT, "float64": DOUBLE, "bignumeric": DECIMAL,
        "bytes": BYTEA, "record": STRUCT,
    },
    "snowflake": {
        "number": DECIMAL, "float": DOUBLE,  # snowflake FLOAT is 64-bit
        "binary": BYTEA, "varbinary": BYTEA,
        "variant": JSON, "object": JSON, "array": ARRAY,
        "timestamp_ntz": TIMESTAMP, "timestamp_ltz": TIMESTAMPTZ,
        "timestamp_tz": TIMESTAMPTZ, "datetime": TIMESTAMP,
    },
    "mssql": {
        "bit": BOOL, "float": DOUBLE, "real": REAL, "money": DECIMAL,
        "smallmoney": DECIMAL, "datetime2": TIMESTAMP,
        "smalldatetime": TIMESTAMP, "datetimeoffset": TIMESTAMPTZ,
        "uniqueidentifier": UUID, "image": BYTEA, "ntext": TEXT,
    },
    "clickhouse": {
        "int8": TINYINT, "int16": SMALLINT, "int32": INTEGER,
        "int64": BIGINT, "uint8": SMALLINT, "uint16": INTEGER,
        "uint32": BIGINT, "uint64": DECIMAL,
        "float32": REAL, "float64": DOUBLE, "datetime64": TIMESTAMP,
        "fixedstring": CHAR,
    },
    "trino": {"varbinary": BYTEA, "float": REAL},
    "oracle": {
        "number": DECIMAL, "binary_float": REAL, "binary_double": DOUBLE,
        "varchar2": VARCHAR, "nvarchar2": VARCHAR, "clob": TEXT,
        "nclob": TEXT, "blob": BYTEA, "raw": BYTEA, "long": TEXT,
    },
    "duckdb": {"hugeint": DECIMAL, "blob": BYTEA, "float": REAL,
               "utinyint": SMALLINT, "usmallint": INTEGER,
               "uinteger": BIGINT, "ubigint": DECIMAL,
               "uhugeint": DECIMAL, "varchar": STRING},
    "spark": {"binary": BYTEA, "float": REAL, "byte": TINYINT,
              "short": SMALLINT, "long": BIGINT,
              "timestamp_ntz": TIMESTAMP, "timestamp_ltz": TIMESTAMPTZ},
    # Athena (Presto-lineage; mysql-flavored DDL spellings surface via
    # Glue). Parity: ibis-server/app/model/metadata/athena.py
    # ATHENA_TYPE_MAPPING — note Athena TIMESTAMP is zone-aware there.
    "athena": {
        "tinytext": TEXT, "mediumtext": TEXT, "longtext": TEXT,
        "enum": VARCHAR, "set": VARCHAR,
        "bit": TINYINT, "mediumint": INTEGER,
        "float": REAL, "double": DOUBLE,
        "timestamp": TIMESTAMPTZ,
        "binary": BYTEA, "varbinary": BYTEA,
    },
    # Redshift (postgres lineage). Parity: metadata/redshift.py
    # REDSHIFT_TYPE_MAPPING; inet/oid fold like the postgres dict, plus
    # the Redshift-specific SUPER/VARBYTE/HLLSKETCH spellings from the
    # public type docs.
    "redshift": {
        "name": CHAR, "inet": VARCHAR, "oid": INTEGER,
        "super": JSON, "varbyte": BYTEA, "hllsketch": VARCHAR,
    },
    # Apache Doris (mysql-flavored). Parity: metadata/doris.py
    # DORIS_TYPE_MAPPING — float is 8-byte there; complex/aggregate
    # types fold to JSON/VARCHAR.
    "doris": {
        "string": VARCHAR, "tinytext": TEXT, "mediumtext": TEXT,
        "longtext": TEXT,
        "largeint": BIGINT, "float": DOUBLE, "decimalv3": DECIMAL,
        "datev2": DATE, "datetimev2": TIMESTAMP,
        "timestamp": TIMESTAMPTZ,
        "variant": JSON, "array": JSON, "map": JSON, "struct": JSON,
        "hll": VARCHAR, "bitmap": VARCHAR,
        "quantile_state": VARCHAR, "agg_state": VARCHAR,
    },
    # Databricks SQL. Parity: metadata/databricks.py
    # DATABRICKS_TYPE_MAPPING (variant/object fold to JSON — the
    # portable enum has no VARIANT).
    "databricks": {
        "binary": BYTEA, "float": REAL, "string": STRING,
        "timestamp_ntz": TIMESTAMP, "variant": JSON, "object": JSON,
        "byte": TINYINT, "short": SMALLINT, "long": BIGINT,
    },
    # Canner (trino-lineage catalog). Parity: metadata/canner.py
    # CANNER_TYPE_MAPPING — float is 8-byte, timestamp zone-aware.
    "canner": {
        "tinytext": TEXT, "mediumtext": TEXT, "longtext": TEXT,
        "enum": VARCHAR, "set": VARCHAR,
        "bit": TINYINT, "mediumint": INTEGER,
        "float": DOUBLE, "timestamp": TIMESTAMPTZ,
        "varbinary": BYTEA,
    },
    # Object-storage scans read through DuckDB in the reference
    # (metadata/object_storage.py DUCKDB_TYPE_MAPPING): same spellings
    # as the duckdb dict plus its bit -> int2 quirk.
    "object_storage": {
        "hugeint": DECIMAL, "blob": BYTEA, "float": REAL,
        "utinyint": SMALLINT, "usmallint": INTEGER,
        "uinteger": BIGINT, "ubigint": DECIMAL,
        "uhugeint": DECIMAL, "varchar": STRING, "bit": SMALLINT,
    },
}

_PARAM_RE = re.compile(r"\s*\(.*\)\s*$")  # numeric(10,2), varchar(255), ...


def normalize_type(backend: str, raw: str | None) -> str:
    """Map a backend-native type name to the portable column type.

    Unrecognized names normalize to UNKNOWN rather than raising: the
    reference behaves the same way (every ``_transform_column_type``
    falls back, e.g. bigquery.py:498), because metadata scraping must
    survive vendor-specific exotica.
    """
    if not raw:
        return UNKNOWN
    t = raw.strip().lower()
    # array spellings first: postgres "_int4" / "int4[]", BQ/CH "array<...>"
    if t.startswith("_") or t.endswith("[]") or t.startswith("array<"):
        return ARRAY
    if t.startswith("struct<") or t.startswith("row("):
        return STRUCT
    if t.startswith("map<") or t.startswith("map("):
        return MAP
    t = _PARAM_RE.sub("", t)            # strip precision/length params
    t = re.sub(r"\s+unsigned$", "", t)  # mysql width/sign suffix
    specific = TYPE_MAPPINGS.get(backend.lower(), {})
    if t in specific:
        return specific[t]
    return _COMMON.get(t, UNKNOWN)


def normalize_tables(tables: list[dict], backend: str) -> list[dict]:
    """Rewrite ``jdbc_metadata`` output in place-shape (new list) with
    portable column types; the raw backend spelling is preserved as
    ``sourceType`` for round-tripping."""
    out = []
    for t in tables:
        cols = [
            {**c, "type": normalize_type(backend, c.get("type")),
             "sourceType": c.get("type")}
            for c in t.get("columns", [])
        ]
        out.append({**t, "columns": cols})
    return out


def build_nested_columns(rows: list[dict], backend: str = "bigquery") -> list[dict]:
    """BigQuery COLUMN_FIELD_PATHS rows -> nested column tree.

    Input rows: ``{"field_path": "a.b.c", "data_type": ..., **extra}``
    in field-path order (the reference's query orders by field_path,
    bigquery.py:75). A row whose path contains a dot is attached to its
    parent's ``nestedColumns``; top-level rows become the table's
    columns. Parents are STRUCT (or ARRAY<STRUCT>) columns and always
    precede children in path order — unknown parents raise, matching
    the reference's find-parent contract (bigquery.py:170-186).
    """
    roots: list[dict] = []
    by_path: dict[str, dict] = {}
    for r in rows:
        path = r["field_path"]
        col = {
            "name": path.rsplit(".", 1)[-1],
            "fieldPath": path,
            "type": normalize_type(backend, r.get("data_type")),
            "sourceType": r.get("data_type"),
            "nestedColumns": None,
        }
        if col["type"] in (STRUCT, ARRAY) and "STRUCT" in (r.get("data_type") or "").upper():
            col["nestedColumns"] = []
        by_path[path] = col
        if "." in path:
            parent = by_path.get(path.rsplit(".", 1)[0])
            if parent is None:
                raise ValueError(f"nested column {path!r} precedes its parent")
            if parent["nestedColumns"] is None:
                parent["nestedColumns"] = []
            parent["nestedColumns"].append(col)
        else:
            roots.append(col)
    return roots
