from wren_engine_spark.mdl.manifest import (
    Column,
    ColumnLevelAccessControl,
    Cube,
    Manifest,
    Model,
    Relationship,
    RowLevelAccessControl,
    SessionProperty,
    View,
)

__all__ = [
    "Manifest",
    "Model",
    "Column",
    "Relationship",
    "View",
    "Cube",
    "RowLevelAccessControl",
    "ColumnLevelAccessControl",
    "SessionProperty",
]
