"""Exact decimal money sums as primitive long aggregations.

``SUM(CAST(x AS DECIMAL(p,s)))`` with a result precision above 18
leaves Spark's compact-long decimal representation: every per-row add
goes through BigDecimal object arithmetic, measured as ~half of
tpch_q1's wall at sf0.1 (0.61 s double-sum floor vs 1.22 s decimal
form on identical data). These helpers compute the SAME exact sums in
primitive codegen arithmetic:

1. per row, the decimal value is converted to an exact integer in
   fixed-point units (:func:`decimal_units`: value · 10^s as a long —
   a decimal multiply by a power of ten is exact, and the cast is of
   an integral value);
2. the units are summed as TWO longs — ``SUM(u DIV 10⁹)`` and
   ``SUM(u MOD 10⁹)`` — so the aggregation state is a pair of
   primitive longs with map-side combine, overflow-safe to ~10¹²·10⁹
   units per group (far past TPC-H sf100k; ANSI arithmetic still
   errors loudly rather than wrapping beyond that);
3. the exact total is reassembled IN DECIMAL (``hi·10⁹ + lo``, then an
   exact power-of-ten decimal division) and only then cast to double.

Step 3's decimal→double cast is the same correctly-rounded,
value-based conversion the original ``CAST(SUM(...) AS DOUBLE)``
performs, and every prior step is exact integer/decimal arithmetic —
so the final double is BIT-IDENTICAL to the naive decimal-sum form
(verified against the DuckDB oracles, which still run the naive SQL).

Units are assumed NON-NEGATIVE (money columns; the DIV/MOD split
identity in step 2 needs the non-negative range — TPC-H money is
non-negative by spec).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: split base: per-row units DIV/MOD 10⁹ keeps both partial sums deep
#: inside long range for any realistic row count per group
_B9 = 1_000_000_000


def decimal_units(dec_col: Column, scale: int) -> Column:
    """Exact integer units of a decimal column: value · 10^scale as a
    long. The decimal multiply is exact (scale arithmetic), the value
    is integral by construction, and the long cast is therefore exact.
    """
    return (dec_col * F.lit(10**int(scale))).cast("long")


def exact_sum_double(unit_col: str, name: str, scale: int):
    """``(agg_exprs, final_col)`` for one exact fixed-point sum.

    ``unit_col`` names a NON-NEGATIVE long column of value·10^scale
    units (see :func:`decimal_units`). The two returned aggregates go
    into ``.agg(...)``; ``final_col`` references their aliases and is
    applied in a ``select`` after the aggregation — its double equals
    ``CAST(SUM(decimal) AS DOUBLE)`` bit-for-bit."""
    hi_name, lo_name = f"__{name}_hi", f"__{name}_lo"
    aggs = [
        F.sum(F.expr(f"`{unit_col}` DIV {_B9}")).alias(hi_name),
        F.sum(F.expr(f"`{unit_col}` % {_B9}")).alias(lo_name),
    ]
    total = F.col(hi_name).cast("decimal(38,0)") * F.lit(_B9) + F.col(lo_name)
    final = (total / F.lit(10**int(scale))).cast("double")
    return aggs, final
