from wren_engine_spark.queries.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
