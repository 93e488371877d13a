"""extract_values — populate value columns from column expressions.

Reference semantics (src/MEDS_transforms/stages/extract_values/
extract_values.py): for each configured output column (numeric_value,
text_value, categorical_value, ...), evaluate a column-expression DSL
config (functions/col_expr.py) and assign it, casting to the MEDS
schema type where the column is a known schema column.

Pure projection — codegen, zero shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from meds_transforms_spark.functions.col_expr import parse_col_expr
from meds_transforms_spark.operators.base import register_stage

_SCHEMA_CASTS = {
    "numeric_value": "float",
    "text_value": "string",
    "categorical_value": "string",
    "code": "string",
    "subject_id": "long",
    "time": "timestamp",
}


@register_stage("extract_values")
def extract_values(df: DataFrame, **column_exprs) -> DataFrame:
    # SIMULTANEOUS assignment over the input frame (one withColumns),
    # matching the reference's single with_columns(new_cols)
    # (extract_values.py:131-137): sequential withColumn would let a
    # later target read an EARLIER target's new value — e.g.
    # {"numeric_value": {...extract...}, "text_value": "numeric_value"}
    # must copy the ORIGINAL numeric_value, not the extracted one. The
    # missing-columns check and the expressions therefore both see the
    # same (input) frame.
    assignments = {}
    for col_name, cfg in column_exprs.items():
        expr, needed = parse_col_expr(cfg)
        missing = needed - set(df.columns)
        if missing:
            raise ValueError(
                f"extract_values target {col_name!r} references missing columns {sorted(missing)}"
            )
        cast_to = _SCHEMA_CASTS.get(col_name)
        if cast_to:
            expr = expr.cast(cast_to)
        assignments[col_name] = expr
    return df.withColumns(assignments) if assignments else df
