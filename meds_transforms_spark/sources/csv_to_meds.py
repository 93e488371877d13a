"""CSV → MEDS conversion source.

Re-expresses the reference's extension example (example/simple_example_pkg/
src/simple_example_pkg/csv_to_meds/csv_to_meds.py:21-27): raw tabular CSV
becomes the long MEDS event table.

Spark-first: ``spark.read.csv`` (schema-inferred or explicit) followed by
``unpivot`` (melt) — both fully distributed; the melt is a zero-shuffle
projection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meds_transforms_spark.schema import CODE, NUMERIC_VALUE, SUBJECT_ID, TIME


def read_csv(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def wide_to_meds(
    df: DataFrame,
    subject_col: str,
    time_col: str | None,
    value_cols: Sequence[str],
    code_prefix: str = "",
    static_cols: Sequence[str] = (),
) -> DataFrame:
    """Melt a wide table (one column per measurement) into MEDS long form.

    Each ``value_cols`` entry becomes rows with code = prefix+colname and
    numeric_value = the cell; ``static_cols`` become null-time rows.
    """
    time_expr = (
        F.col(time_col).cast("timestamp") if time_col else F.lit(None).cast("timestamp")
    )
    base = df.select(
        F.col(subject_col).cast("long").alias(SUBJECT_ID),
        time_expr.alias(TIME),
        *[F.col(c) for c in [*value_cols, *static_cols]],
    )
    melted = base.unpivot(
        [SUBJECT_ID, TIME],
        list(value_cols),
        CODE,
        "__val",
    ).select(
        SUBJECT_ID,
        TIME,
        F.concat(F.lit(code_prefix), F.col(CODE)).alias(CODE),
        F.col("__val").cast("float").alias(NUMERIC_VALUE),
    )
    if static_cols:
        statics = base.unpivot(
            [SUBJECT_ID],
            list(static_cols),
            CODE,
            "__val",
        ).filter(
            # A NULL static value would null-propagate through the
            # concat into a NULL code — a phantom event. No value means
            # no static fact to record.
            F.col("__val").isNotNull()
        ).select(
            SUBJECT_ID,
            F.lit(None).cast("timestamp").alias(TIME),
            # Static categorical convention: CODE//VALUE
            F.concat(
                F.lit(code_prefix), F.col(CODE), F.lit("//"), F.col("__val").cast("string")
            ).alias(CODE),
            F.lit(None).cast("float").alias(NUMERIC_VALUE),
        )
        melted = statics.unionByName(melted)
    return melted.filter(F.col(NUMERIC_VALUE).isNotNull() | F.col(TIME).isNull())


def csv_to_meds(
    spark: SparkSession,
    path: str,
    subject_col: str,
    time_col: str | None,
    value_cols: Sequence[str],
    **kw,
) -> DataFrame:
    return wide_to_meds(read_csv(spark, path), subject_col, time_col, value_cols, **kw)
