"""Built-in operator (stage) registry.

Importing this package registers every built-in stage. MEDS-parity
stages mirror SURVEY.md §2; dedup / similarity / text / multimodal are
the large-scale training-data extensions.
"""

from meds_transforms_spark.operators.base import (
    Stage,
    bind_stage,
    get_stage,
    register_stage,
    registered_stages,
)
from meds_transforms_spark.operators import (  # noqa: F401  (registration side effects)
    add_time_derived,
    aggregate_code_metadata,
    asof,
    bin_numeric_values,
    components,
    decontaminate,
    dedup,
    extract_values,
    filter_measurements,
    filter_subjects,
    fit_vocabulary_indices,
    funnel,
    interval,
    ivf,
    match_revise,
    misc,
    multimodal,
    normalization,
    occlude_outliers,
    packing,
    quantiles,
    reorder_measurements,
    reshard_to_split,
    rolling,
    sampling,
    similarity,
    text,
    validate,
)

__all__ = [
    "Stage",
    "bind_stage",
    "get_stage",
    "register_stage",
    "registered_stages",
]
