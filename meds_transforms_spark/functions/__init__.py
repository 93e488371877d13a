from meds_transforms_spark.functions.matcher import matcher_to_expr, is_matcher
from meds_transforms_spark.functions.col_expr import parse_col_expr
from meds_transforms_spark.functions.time_units import normalize_time_unit, SECONDS_PER

__all__ = [
    "matcher_to_expr",
    "is_matcher",
    "parse_col_expr",
    "normalize_time_unit",
    "SECONDS_PER",
]
