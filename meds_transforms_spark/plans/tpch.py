"""TPC-H-style relational suite over the driver's synthetic star schema.

The shipped tables are a reduced TPC-H (no partsupp, no
commit/receipt dates, no shipmode/phone/comment columns), so queries
whose canonical text needs those columns are *adapted*: the predicate
constants change but the plan shape — the thing a 100 TB run cares
about — is preserved (outer-join histogram, correlated scalar
subquery, semi+anti composition, disjunctive pushdown, group-having
against a global scalar).

Cross-engine determinism (see README "Determinism & parity"): every
money sum runs over exact DECIMAL casts and is cast to DOUBLE only at
the output boundary; threshold comparisons against averages are
cross-multiplied (`2·qty·n < Σqty`) so both engines compare exact
decimals instead of engine-rounded divisions.

Scale notes baked into each plan:
- nation/region/supplier are broadcast always (≤ thousands of rows at
  any SF); part is broadcast here but would be a shuffle join at
  SF ≥ 1k (AQE decides when we don't hint).
- customer/orders/lineitem joins shuffle on their keys; AQE handles
  skew and picks broadcast when a filtered side collapses.
- every aggregation is a partial+final hash agg (map-side combine) —
  verified in PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["QUERIES", "ORACLES"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col: str, p: int = 12, s: int = 2):
    return F.col(col).cast(f"decimal({p},{s})")


def _revenue():
    """extendedprice * (1 - discount) over exact decimals."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))


def q_tpch_q7(spark, sf_dir):
    """Q7 volume shipping: revenue flow between two nations by year.

    Plan: lineitem⋈supplier (broadcast) ⋈orders⋈customer (shuffle)
    ⋈nation×2 (broadcast); the OR'd nation-pair filter lands after the
    two small joins so only the pair survives the big shuffle.
    """
    li, sup, orders, cust, nat = (
        _t(spark, sf_dir, n) for n in ["lineitem", "supplier", "orders", "customer", "nation"]
    )
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def q_tpch_q8(spark, sf_dir):
    """Q8 market share: NATION_2 suppliers' share of ASIA-customer
    STANDARD-part revenue by order year — conditional-sum ratio where
    both sums stay decimal until one double division at the end."""
    li, sup, orders, cust, nat, reg, part = (
        _t(spark, sf_dir, n)
        for n in ["lineitem", "supplier", "orders", "customer", "nation", "region", "part"]
    )
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = _revenue()
    zero = F.lit(0).cast("decimal(38,6)")
    asia_cust = (
        cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    joined = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "STANDARD")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol.cast("decimal(38,6)")).otherwise(zero))
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
    )


def q_tpch_q9(spark, sf_dir):
    """Q9 product-type profit (adapted: no partsupp ⇒ profit = revenue):
    revenue of '%widget%' parts by supplier nation × order year."""
    li, sup, orders, nat, part = (
        _t(spark, sf_dir, n) for n in ["lineitem", "supplier", "orders", "nation", "part"]
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_revenue()).cast("double").alias("sum_profit"))
    )


def q_tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting: top 20 customers by revenue lost to
    returns in a quarter; ordering on the exact decimal, cast after."""
    li, orders, cust, nat = (
        _t(spark, sf_dir, n) for n in ["lineitem", "orders", "customer", "nation"]
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


def q_tpch_q12(spark, sf_dir):
    """Q12 (adapted: no shipmode ⇒ group by linestatus): urgent- vs
    low-priority line counts per line status for one ship year."""
    li, orders = (_t(spark, sf_dir, n) for n in ["lineitem", "orders"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q13(spark, sf_dir):
    """Q13 customer distribution: LEFT OUTER join with a right-side-only
    predicate, per-customer order count, then a count-of-counts
    histogram — two shuffles, the second on a tiny key space."""
    orders, cust = (_t(spark, sf_dir, n) for n in ["orders", "customer"])
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q14(spark, sf_dir):
    """Q14 promotion effect: PROMO revenue share for one month — a
    single-row conditional-sum ratio."""
    li, part = (_t(spark, sf_dir, n) for n in ["lineitem", "part"])
    vol = _revenue()
    zero = F.lit(0).cast("decimal(38,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol.cast("decimal(38,6)")).otherwise(zero))
            .cast("double")
            .alias("promo_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_volume") / F.col("total_volume")).alias("promo_share"),
            "total_volume",
        )
    )


def q_tpch_q15(spark, sf_dir):
    """Q15 top supplier: quarterly revenue per supplier, keep those
    equal to the global max — scalar subquery as a broadcast cross
    join against a 1-row aggregate; equality on exact decimals."""
    li, sup = (_t(spark, sf_dir, n) for n in ["lineitem", "supplier"])
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_rev_dec"))
        # Pin: the scalar-max branch and the final join both consume
        # this aggregate, and the join pushes an isnotnull into one
        # branch so the subtrees stop canonicalizing into one
        # ReusedExchange — unpinned, the lineitem scan + agg ran TWICE
        # (verified in the executed plan). |suppliers| rows.
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev_dec") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"),
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q16(spark, sf_dir):
    """Q16 (adapted: supplier counts from lineitem, not partsupp):
    distinct suppliers per (brand, type, size) for selected sizes,
    excluding one brand — distinct-agg after a broadcast join."""
    li, part = (_t(spark, sf_dir, n) for n in ["lineitem", "part"])
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#5")
                    & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue: lines with qty below half the
    part's average qty. The correlated AVG subquery becomes a grouped
    pre-agg joined back; the comparison is cross-multiplied
    (2·qty·n < Σqty) so both engines compare exact decimals."""
    li, part = (_t(spark, sf_dir, n) for n in ["lineitem", "part"])
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_qty"),
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#3")), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(_dec("l_quantity") * 2 * F.col("n_qty") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: orders whose total quantity exceeds
    250 — HAVING on an exact decimal sum, then joins back to orders
    and customer."""
    li, orders, cust = (_t(spark, sf_dir, n) for n in ["lineitem", "orders", "customer"])
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > F.lit(250).cast("decimal(12,2)"))
    )
    return (
        big.join(orders, F.col("ok") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


def q_tpch_q19(spark, sf_dir):
    """Q19 discounted revenue: three OR'd (brand, size, qty) clauses —
    the disjunction must not defeat join pushdown; part prunes to the
    three brands before the broadcast join."""
    li, part = (_t(spark, sf_dir, n) for n in ["lineitem", "part"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 50)) & (F.col("l_quantity").between(20, 30)))
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q21(spark, sf_dir):
    """Q21 (adapted: no receipt/commit dates ⇒ 'returned' = flag R):
    suppliers who were the *only* supplier with a returned line in a
    multi-supplier order.

    The canonical double-EXISTS (kept verbatim in the oracle SQL) is
    algebraically a grouped counting problem: per (order, supplier)
    compute has-returned, then per order count suppliers and returned
    suppliers — "EXISTS other supplier" ⇔ n_supp > 1, "NOT EXISTS other
    returned supplier" ⇔ n_ret = 1; since n_ret = 1, the lone returned
    supplier is recoverable in the same aggregate (max over the
    conditional). TWO chained hash aggs — (order, supplier) then
    (order) — where the literal semi+anti-join plan costs five
    exchanges (two distincts + two joins re-shuffling the fact table).
    Measured 1.7× warm / 2.5× cold at sf0.1; identical results,
    oracle-verified against the canonical EXISTS SQL.
    """
    li, sup = (_t(spark, sf_dir, n) for n in ["lineitem", "supplier"])
    g = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    per_order = g.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_ret"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("ret_sk"),
    )
    lone = per_order.filter((F.col("n_ret") == 1) & (F.col("n_supp") > 1))
    return (
        lone.join(F.broadcast(sup), F.col("ret_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_tpch_q22(spark, sf_dir):
    """Q22 (adapted: no phone ⇒ nation; dormant = no recent URGENT
    order): customers above the average positive balance with no
    urgent order since 2000, per nation. The avg threshold is
    cross-multiplied (bal·n > Σbal) for exact decimal comparison."""
    orders, cust, nat = (_t(spark, sf_dir, n) for n in ["orders", "customer", "nation"])
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("sum_bal"), F.count(F.lit(1)).alias("n_bal")
    )
    urgent_recent = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("n_bal") > F.col("sum_bal"))
        .join(urgent_recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def q_tpch_q11(spark, sf_dir):
    """Q11 important parts (adapted: value = lineitem revenue from
    NATION_1 suppliers, not partsupp stock): parts whose value exceeds
    0.1% of the total — HAVING against a global scalar, exact via
    value·1000 > total."""
    li, sup, nat = (_t(spark, sf_dir, n) for n in ["lineitem", "supplier", "nation"])
    n1 = nat.filter(F.col("n_name") == "NATION_1")
    from_n1 = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value_dec"))
        # Pin: consumed by the HAVING total AND the final filter-join —
        # unpinned, the broadcast-join + lineitem agg ran twice (same
        # fan-out-aggregate class as q15). |parts| rows.
        .localCheckpoint(eager=False)
    )
    total = from_n1.agg(F.sum("value_dec").alias("total_dec"))
    return (
        from_n1.join(F.broadcast(total))
        .filter(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
    )


def q_tpch_q4(spark, sf_dir):
    """Q4 order-priority checking (adapted: no commit/receipt dates ⇒
    'late' = a returned line): count orders per priority that have at
    least one returned lineitem in a quarter — EXISTS ⇒ left_semi
    against a pre-projected key set; the quarter filter prunes orders
    before the shuffle."""
    li, orders = (_t(spark, sf_dir, n) for n in ["lineitem", "orders"])
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q20(spark, sf_dir):
    """Q20 potential part promotion (adapted: no partsupp ⇒ 'excess'
    suppliers from lineitem itself): suppliers of NATION_1 who shipped
    more than 50 units of some '%widget%' part —
    a grouped HAVING pre-agg flows into a left_semi against supplier:
    the nested-IN chain of the canonical text becomes two semi joins,
    no subquery re-evaluation."""
    li, sup, nat, part = (
        _t(spark, sf_dir, n) for n in ["lineitem", "supplier", "nation", "part"]
    )
    wanted = part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    heavy = (
        li.join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(50).cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    return (
        sup.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


def q_tpch_q2(spark, sf_dir):
    """Q2 (adapted: no partsupp ⇒ min retail price): parts priced at
    the minimum of their type — the correlated MIN subquery as a
    window min over the dimension, equality on exact decimals."""
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_type")
    price = _dec("p_retailprice")
    return (
        part.withColumn("min_price", F.min(price).over(w))
        .filter(price == F.col("min_price"))
        .select(
            "p_type", "p_partkey", "p_name",
            F.col("min_price").cast("double").alias("retailprice"),
        )
    )


# --- DuckDB oracles ---------------------------------------------------

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

ORACLES: dict[str, str] = {
    "tpch_q7": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year, {_REV} AS volume
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CASE WHEN n1.n_name = 'NATION_2'
                             THEN CAST({_REV} AS DECIMAL(38,6))
                             ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(sum({_REV}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        )
        GROUP BY o_year
    """,
    "tpch_q9": f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum({_REV}) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        GROUP BY n_name, o_year
    """,
    "tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(rev_dec AS DOUBLE) AS revenue
        FROM (
          SELECT c_custkey, c_name, c_acctbal, n_name, sum({_REV}) AS rev_dec
          FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
          GROUP BY c_custkey, c_name, c_acctbal, n_name
        ) ORDER BY rev_dec DESC, c_custkey LIMIT 20
    """,
    "tpch_q12": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                 AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                 AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "tpch_q14": f"""
        SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                     THEN CAST({_REV} AS DECIMAL(38,6))
                                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(sum({_REV}) AS DOUBLE) AS promo_share,
               CAST(sum({_REV}) AS DOUBLE) AS total_volume
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "tpch_q15": f"""
        WITH rev AS (
          SELECT l_suppkey, sum({_REV}) AS total_rev_dec
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM rev)
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q17": """
        WITH per_part AS (
          SELECT l_partkey AS pk,
                 sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
                 count(*) AS n_qty
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#3'
        JOIN per_part ON l_partkey = pk
        WHERE CAST(l_quantity AS DECIMAL(12,2)) * 2 * n_qty < sum_qty
    """,
    "tpch_q18": """
        WITH big AS (
          SELECT l_orderkey AS ok, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > CAST(250 AS DECIMAL(12,2))
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum_qty_dec AS DOUBLE) AS sum_qty
        FROM big JOIN orders ON ok = o_orderkey
        JOIN customer ON c_custkey = o_custkey
    """,
    "tpch_q19": f"""
        SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue, count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q21": """
        WITH r AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        ),
        alls AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        SELECT s_name, count(*) AS numwait
        FROM r JOIN supplier ON s_suppkey = r.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM alls a
            WHERE a.l_orderkey = r.l_orderkey AND a.l_suppkey <> r.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM r r2
            WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey
          )
        GROUP BY s_name
    """,
    "tpch_q22": """
        WITH pos AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal, count(*) AS n_bal
          FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer, pos
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_bal > sum_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY n_name
    """,
    "tpch_q11": f"""
        WITH from_n1 AS (
          SELECT l_partkey, sum({_REV}) AS value_dec
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
          GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        FROM from_n1, (SELECT sum(value_dec) AS total_dec FROM from_n1) t
        WHERE value_dec * 1000 > total_dec
    """,
    "tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
    """,
    "tpch_q20": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
            )
            GROUP BY l_suppkey, l_partkey
            HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > CAST(50 AS DECIMAL(12,2))
          )
          AND s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1'
          )
    """,
    "tpch_q2": """
        SELECT p_type, p_partkey, p_name,
               CAST(min_price AS DOUBLE) AS retailprice
        FROM (
          SELECT p_type, p_partkey, p_name,
                 CAST(p_retailprice AS DECIMAL(12,2)) AS price,
                 min(CAST(p_retailprice AS DECIMAL(12,2)))
                   OVER (PARTITION BY p_type) AS min_price
          FROM part
        ) WHERE price = min_price
    """,
}

QUERIES = {
    "tpch_q2": q_tpch_q2,
    "tpch_q4": q_tpch_q4,
    "tpch_q20": q_tpch_q20,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
}
