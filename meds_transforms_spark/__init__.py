"""meds_transforms_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of mmcdermott/MEDS_transforms.

Design stance (see SURVEY.md §7): DataFrame-first. A MEDS dataset is a
parquet directory convention; a *stage* is a registered
``DataFrame -> DataFrame`` transform; a *pipeline* is a YAML-declared
ordered composition. Catalyst does all query optimization — we declare
logical plans with the DataFrame API and write zero custom rules.

Beyond reference parity, the package carries large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB / 1000-executor operation.
"""

from meds_transforms_spark.schema import (
    MEDS_DATA_SCHEMA,
    CODE_METADATA_SCHEMA,
    SUBJECT_SPLITS_SCHEMA,
)
from meds_transforms_spark.plan_guard import UnscalablePlanError, assert_scalable
from meds_transforms_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "MEDS_DATA_SCHEMA",
    "CODE_METADATA_SCHEMA",
    "SUBJECT_SPLITS_SCHEMA",
    "get_spark",
    "assert_scalable",
    "UnscalablePlanError",
    "__version__",
]
