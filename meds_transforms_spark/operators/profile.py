"""One-pass table profiling — the data-quality dashboard primitive.

``profile_table`` computes, for every requested column, in a SINGLE
scan of the table: row count, null count, distinct count, and (for
numeric/timestamp columns) min / max / mean. The wide-to-long pivot
happens on the 1-row aggregate result, so the output is one tidy row
per column regardless of table width.

Scale notes:

- Default ``exact=False`` uses ``approx_count_distinct`` (HyperLogLog++,
  1.6 KB sketch per column, map-side combined) — the only sane NDV at
  100 TB; the whole profile is then one partial-aggregate pass with NO
  expand and NO extra shuffle beyond the final 1-row reduce.
- ``exact=True`` switches to ``count(DISTINCT col)``, which Catalyst
  plans as an Expand: the scan is replicated once per distinct
  aggregate (N columns → N× the rows into the first shuffle). Correct,
  oracle-checkable, and the documented expensive mode — the same
  trade-off aggregate_code_metadata documents for its n_subjects
  distincts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage

#: exact base-type names — a prefix test would route "interval day to
#: second" into the numeric path via the "int" prefix
_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


@register_stage("profile_table")
def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value, mean_value)`` — numeric stats are NULL for
    non-numeric columns; timestamps profile on epoch microseconds so
    the numeric columns stay a uniform DOUBLE."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        dt = dtypes[c]
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"))
        # map columns are neither hashable (approx NDV) nor orderable
        # (exact NDV) — profile them as nulls rather than failing the
        # whole-table profile on one metadata column
        if dt.startswith("map<"):
            aggs.append(F.first(F.lit(None).cast("long")).alias(f"__ndv_{c}"))
        elif exact:
            aggs.append(F.count_distinct(col).alias(f"__ndv_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__ndv_{c}"))
        if dt.startswith("timestamp"):
            num = col.cast("double") * 1e6
        elif dt in _NUMERIC or dt.startswith("decimal"):
            num = col.cast("double")
        else:
            num = F.lit(None).cast("double")
        mn, mx, av = F.min(num), F.max(num), F.avg(num)
        if round_to is not None:
            mn, mx, av = (F.round(x, int(round_to)) + F.lit(0.0) for x in (mn, mx, av))
        aggs += [mn.alias(f"__min_{c}"), mx.alias(f"__max_{c}"), av.alias(f"__mean_{c}")]
    one = df.agg(*aggs)
    # long format: one struct per column, exploded on the 1-row frame
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__ndv_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
                F.col(f"__mean_{c}").alias("mean_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("p")).select("p.*")
