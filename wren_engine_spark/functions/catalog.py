"""Function catalog: the queryable function-list surface.

Parity targets:
  - ``GET /{ds}/functions`` / ``/function/{name}`` (reference
    v3/connector.py:428-478) — list callable functions with metadata;
  - the per-backend CSV catalogs
    (ibis-server/resources/function_list/*.csv, schema
    ``function_type,name,return_type,param_names,param_types,description``)
    — here Spark's own builtin registry IS the execution surface, so the
    catalog is generated live from ``SHOW FUNCTIONS`` + ``DESCRIBE
    FUNCTION`` instead of a static whitelist;
  - remote/bypass function *declaration*
    (wren-core/core/src/mdl/function/remote_function.rs:120-697): the
    reference registers pass-through UDFs so unknown backend functions
    survive planning. Executing on Spark there is no remote side, so a
    declaration here registers a real implementation if given one, else
    records the signature for catalog queries only.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class FunctionSpec:
    function_type: str  # scalar | aggregate | window | table
    name: str
    return_type: str | None = None
    param_names: list[str] = field(default_factory=list)
    param_types: list[str] = field(default_factory=list)
    description: str | None = None

    def to_dict(self) -> dict:
        return {
            "function_type": self.function_type,
            "name": self.name,
            "return_type": self.return_type,
            "param_names": self.param_names or None,
            "param_types": self.param_types or None,
            "description": self.description,
        }


# Spark builtin aggregates/windows for type tagging (subset that matters
# for the reference's function_type field)
_AGGREGATES = {
    "sum", "count", "avg", "mean", "min", "max", "median", "mode", "first", "last",
    "first_value", "last_value", "any_value", "stddev", "stddev_pop", "stddev_samp",
    "variance", "var_pop", "var_samp", "skewness", "kurtosis", "corr", "covar_pop",
    "covar_samp", "collect_list", "collect_set", "array_agg", "approx_count_distinct",
    "approx_percentile", "percentile", "percentile_approx", "bit_and", "bit_or",
    "bit_xor", "bool_and", "bool_or", "every", "any", "some", "count_if",
    "count_min_sketch", "grouping", "grouping_id", "histogram_numeric", "hll_sketch_agg",
    "hll_union_agg", "max_by", "min_by", "regr_avgx", "regr_avgy", "regr_count",
    "regr_intercept", "regr_r2", "regr_slope", "regr_sxx", "regr_sxy", "regr_syy",
    "string_agg", "listagg", "sum_distinct", "try_avg", "try_sum",
}
_WINDOWS = {
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist", "ntile",
    "lag", "lead", "nth_value",
}
_TABLE_FNS = {"explode", "explode_outer", "inline", "inline_outer", "posexplode",
              "posexplode_outer", "stack", "json_tuple", "range", "sequence"}


class FunctionCatalog:
    """Live + declared function catalog over a SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._declared: dict[str, FunctionSpec] = {}

    # ------------------------------------------------------------ listing

    def list_functions(self, refresh: bool = False) -> list[FunctionSpec]:
        rows = self.spark.sql("SHOW FUNCTIONS").collect()
        out = []
        for r in rows:
            name = r[0].split(".")[-1]
            if name in _WINDOWS:
                ftype = "window"
            elif name in _AGGREGATES:
                ftype = "aggregate"
            elif name in _TABLE_FNS:
                ftype = "table"
            else:
                ftype = "scalar"
            out.append(FunctionSpec(function_type=ftype, name=name))
        out.extend(self._declared.values())
        return out

    def describe(self, name: str) -> FunctionSpec | None:
        low = name.lower()
        if low in self._declared:
            return self._declared[low]
        try:
            rows = self.spark.sql(f"DESCRIBE FUNCTION EXTENDED {name}").collect()
        except Exception:  # noqa: BLE001 - unknown function
            return None
        desc = " ".join(
            r[0].removeprefix("Usage:").strip()
            for r in rows
            if r[0].startswith("Usage:")
        )
        ftype = (
            "window" if low in _WINDOWS
            else "aggregate" if low in _AGGREGATES
            else "table" if low in _TABLE_FNS
            else "scalar"
        )
        return FunctionSpec(function_type=ftype, name=low, description=desc or None)

    # -------------------------------------------------------- declaration

    def declare(self, spec: FunctionSpec, impl=None) -> None:
        """Declare a function (reference remote-function registration,
        wren-core-py ``register_remote_function``). With ``impl`` the
        function becomes callable via ``spark.udf.register``; without, it
        is catalog-only metadata."""
        self._declared[spec.name.lower()] = spec
        if impl is not None:
            from wren_engine_spark.mdl.types import map_type

            self.spark.udf.register(
                spec.name, impl, map_type(spec.return_type or "string")
            )

    def load_csv(self, text: str) -> int:
        """Load declarations from the reference's CSV catalog format."""
        n = 0
        for row in csv.DictReader(io.StringIO(text)):
            self._declared[row["name"].lower()] = FunctionSpec(
                function_type=row.get("function_type", "scalar"),
                name=row["name"],
                return_type=row.get("return_type") or None,
                param_names=(row.get("param_names") or "").split(",") if row.get("param_names") else [],
                param_types=(row.get("param_types") or "").split(",") if row.get("param_types") else [],
                description=row.get("description") or None,
            )
            n += 1
        return n
