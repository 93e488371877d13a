"""bin_numeric_values — bucket values into per-code quantile/custom bins.

Reference semantics (src/MEDS_transforms/stages/bin_numeric_values/
bin_numeric_values.py): per-code bin endpoints come from the metadata
table (e.g. the ``values/quantiles`` struct) or a custom_bins config;
each row's value is located in its code's endpoint list via
``search_sorted(side="right")`` over a per-row list (:183-206), and the
code is rewritten via a bin-name template like
``"{code}//value_[{left},{right})"``.

Spark plan: no per-row binary-search window needed — the bin index is
``size(filter(endpoints, e -> e <= v))`` (count endpoints ≤ v ==
right-sided insertion point), an array higher-order function evaluated
JVM-side after a broadcast join of the endpoint arrays. Zero shuffle of
the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import CODE, NUMERIC_VALUE


def endpoints_from_quantiles(code_metadata: DataFrame, quantiles_col: str = "values/quantiles") -> DataFrame:
    """(code, __endpoints array<float>) from the quantiles struct column.

    Endpoints are FLOAT (f32), matching the reference's metadata dtype:
    both the bin comparison (e ≤ v against f32 values) and the bin-name
    formatting ("96.2", not "96.19999694824219") depend on it.
    """
    struct_fields = [
        f.name
        for f in code_metadata.schema[quantiles_col].dataType.fields
    ]
    arr = F.array(*[F.col(f"`{quantiles_col}`.`{f}`") for f in struct_fields])
    return code_metadata.select(
        CODE, F.array_sort(arr).cast("array<float>").alias("__endpoints")
    )


@register_stage("bin_numeric_values")
def bin_numeric_values(
    df: DataFrame,
    code_metadata: DataFrame | None = None,
    custom_bins: dict[str, Sequence[float]] | None = None,
    code_with_bin_name: str = "{code}//_[{left},{right})",
    drop_numeric_value: bool = True,
) -> DataFrame:
    """Rewrite code → binned code name; optionally drop the raw value.

    Bin semantics (right-closed insertion, matching side="right"):
    value v with sorted endpoints [e1..en] lands in bin
    i = #{e : e <= v}; bin name interval is [e_i, e_{i+1}) with -inf/inf
    at the edges.
    """
    spark = df.sparkSession
    if custom_bins:
        rows = [(c, sorted(float(x) for x in eps)) for c, eps in custom_bins.items()]
        bins = spark.createDataFrame(rows, "code string, __endpoints array<float>")
    elif code_metadata is not None:
        bins = endpoints_from_quantiles(code_metadata)
    else:
        raise ValueError("bin_numeric_values needs code_metadata or custom_bins")

    joined = df.join(F.broadcast(bins), on=CODE, how="left")
    v = F.col(NUMERIC_VALUE)
    eps = F.col("__endpoints")
    # Right-sided insertion point: count endpoints <= v.
    idx = F.size(F.filter(eps, lambda e: e <= v))
    left = F.when(idx > 0, F.element_at(eps, idx).cast("string")).otherwise(F.lit("-inf"))
    right = F.when(idx < F.size(eps), F.element_at(eps, idx + 1).cast("string")).otherwise(
        F.lit("inf")
    )
    # Instantiate the name template with {code}/{left}/{right}.
    name = F.lit(code_with_bin_name)
    name = F.replace(name, F.lit("{code}"), F.col(CODE))
    name = F.replace(name, F.lit("{left}"), left)
    name = F.replace(name, F.lit("{right}"), right)

    # eps element nullity matters too: a code whose quantile struct is
    # all-NULL (no observed values) yields [null,null,null] endpoints,
    # and a null left/right would null-propagate through F.replace and
    # rewrite CODE itself to NULL — leave such rows unbinned instead.
    binnable = (
        v.isNotNull()
        & ~F.isnan(v)
        & eps.isNotNull()
        & ~F.exists(eps, lambda e: e.isNull())
    )
    out = joined.withColumn(CODE, F.when(binnable, name).otherwise(F.col(CODE)))
    if drop_numeric_value:
        out = out.withColumn(NUMERIC_VALUE, F.when(~binnable, v))
    return out.drop("__endpoints")
