"""wren_engine_spark — a PySpark-native semantic analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference semantic-layer engine (Canner/wren-engine, see SURVEY.md):
MDL manifest -> governed Spark temp views (expression columns,
relationships, calculated fields, row/column-level access control,
views, cubes) -> arbitrary Spark SQL over the semantic layer, executed
by Catalyst/Tungsten instead of unparse-to-backend-dialect.

Modules:
  mdl        - manifest data model, type mapping, lineage analysis
  engine     - SemanticEngine: deploy manifest, answer SQL
  sources    - physical source resolution (parquet/csv/json/jdbc/catalog)
  operators  - large-scale data-pipeline operators (dedup, similarity,
               text analysis, multimodal plumbing)
  functions  - function catalog + compatibility helpers
  plans      - SQL text generation (dry-plan / CTE expansion)
  streaming  - Structured Streaming extensions (beyond reference parity)
"""

from wren_engine_spark.mdl.manifest import (
    Column,
    Manifest,
    Model,
    Relationship,
    View,
)
from wren_engine_spark.engine import SemanticEngine

__all__ = [
    "Manifest",
    "Model",
    "Column",
    "Relationship",
    "View",
    "SemanticEngine",
]

__version__ = "0.1.0"
