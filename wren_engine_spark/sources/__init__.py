from wren_engine_spark.sources.registry import SourceRegistry, DirectorySource

__all__ = ["SourceRegistry", "DirectorySource"]
