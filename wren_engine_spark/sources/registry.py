"""Physical source resolution.

The reference federates 20 backends by generating dialect SQL executed
remotely (ibis-server/app/model/data_source.py:262-530) and reads
local/object-store files through DataFusion ListingTable / DuckDB httpfs
(wren-core/core/src/mdl/mod.rs:104-167, ibis-server/app/model/utils.py).
On Spark the same surface is native: catalog tables (incl. JDBC/Iceberg/
Delta via catalogs), ``spark.read.{parquet,csv,json,orc}`` for files, and
``spark.read.jdbc`` for direct remote tables. This registry maps an MDL
``table_reference`` to a DataFrame.

Reference styles accepted:
  - ``scheme:path``   e.g. ``parquet:/data/orders.parquet``, ``csv:/x.csv``
  - plain path ending in .parquet/.csv/.json/.orc
  - bare/qualified table name -> resolved against registered directory
    sources first, then ``spark.table``.

At 100 TB the hot path is parquet/Delta on object storage: scans stay
splittable (file-level + row-group parallelism), filters/projections are
pushed to the footer level by Catalyst, and partition-column pruning
works when the dataset is written partitioned — nothing here collects to
the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class SourceError(ValueError):
    pass


class DirectorySource:
    """A directory of ``<table>.parquet`` (or csv/json) files, the layout
    of the driver testdata (TESTDATA.md)."""

    def __init__(self, path: str, fmt: str = "parquet"):
        self.path = path
        self.fmt = fmt

    def resolve(self, spark: SparkSession, name: str) -> DataFrame | None:
        p = os.path.join(self.path, f"{name}.{self.fmt}")
        if os.path.exists(p):
            return _read(spark, self.fmt, p)
        return None


def _read(spark: SparkSession, fmt: str, path: str, **opts) -> DataFrame:
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


_EXT_FMT = {".parquet": "parquet", ".csv": "csv", ".json": "json", ".orc": "orc"}


class SourceRegistry:
    """Resolves MDL table references to DataFrames."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._dirs: list[DirectorySource] = []
        self._tables: dict[str, DataFrame] = {}

    def add_directory(self, path: str, fmt: str = "parquet") -> "SourceRegistry":
        self._dirs.append(DirectorySource(path, fmt))
        return self

    def add_dataframe(self, name: str, df: DataFrame) -> "SourceRegistry":
        self._tables[name.lower()] = df
        return self

    def resolve_sql(self, table_reference: str) -> str:
        """FROM-clause SQL text for a table reference (for dry-plan /
        CTE generation): file sources use Spark's direct-path syntax
        (``parquet.`/path```), catalog tables their name."""
        ref = table_reference.strip()
        scheme, _, rest = ref.partition(":")
        if scheme.lower() in ("parquet", "csv", "json", "orc") and rest:
            return f"{scheme.lower()}.`{rest}`"
        ext = os.path.splitext(ref)[1].lower()
        if ext in _EXT_FMT:
            return f"{_EXT_FMT[ext]}.`{ref}`"
        short = ref.split(".")[-1].strip('"`')
        for d in self._dirs:
            p = os.path.join(d.path, f"{short}.{d.fmt}")
            if os.path.exists(p):
                return f"{d.fmt}.`{p}`"
        return ref

    def resolve(self, table_reference: str) -> DataFrame:
        ref = table_reference.strip()
        scheme, _, rest = ref.partition(":")
        if scheme.lower() in ("parquet", "csv", "json", "orc") and rest:
            return _read(self.spark, scheme.lower(), rest)
        ext = os.path.splitext(ref)[1].lower()
        if ext in _EXT_FMT:
            return _read(self.spark, _EXT_FMT[ext], ref)
        # bare or catalog.schema.table name: try short name against
        # registered frames/directories, else the Spark catalog
        short = ref.split(".")[-1].strip('"`')
        if short.lower() in self._tables:
            return self._tables[short.lower()]
        for d in self._dirs:
            df = d.resolve(self.spark, short)
            if df is not None:
                return df
        try:
            return self.spark.table(ref)
        except Exception as e:  # noqa: BLE001
            raise SourceError(f"cannot resolve table reference {table_reference!r}: {e}") from e
