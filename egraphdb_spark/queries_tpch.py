"""Q8 / Q15 / Q17 / Q21 — the last TPC-H plan shapes.

With Q1/Q3/Q5/rollup (queries.py) and Q4/Q6/Q7/Q10/Q12/Q13/Q14/Q18/Q19/Q22
(queries_ext.py) this completes every TPC-H query shape the driver's tables
can express: the fixture has no `partsupp` and lineitem carries no
commitdate/receiptdate/shipmode/container columns, so Q2/Q9/Q11/Q16/Q20
are out of scope, and Q17/Q21 run adapted predicates that preserve the
*plan shape* (the thing being tested) on the columns that exist.

Determinism: every money aggregate is integer cents (`round(x*100)`)
summed in DECIMAL, cast once at the end; every ratio is returned as a
(numerator, denominator) integer pair so no engine ever divides — see
the parity recipes in NOTES_r1/NOTES_r2.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _t(spark, sf_dir: str, name: str):
    from .graph import load_tables

    return load_tables(spark, sf_dir)[name]


_REV_CENTS100 = (
    "cast(round(l_extendedprice * 100) as decimal(18,0))"
    " * cast(round((1 - l_discount) * 100) as decimal(18,0))"
)
_REV_CENTS100_SQL = (
    "CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))"
    " * CAST(round((1 - l_discount) * 100) AS DECIMAL(18,0))"
)


# --------------------------------------------------------------------------
# Q8 — national market share: two dimension chains, ratio as (num, den)
# --------------------------------------------------------------------------


def q_agg_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_1's share of STANDARD-part volume sold into
    EUROPE customers, by order year.  Two independent dim chains (supplier
    →nation for the "which nation supplied it" axis; customer→nation→
    region restricting the market) hang off lineitem⋈orders.

    The share is returned as (nation_volume, total_volume) integer pair —
    no division anywhere, so both engines agree bit-for-bit.  Scale: all
    dims broadcast; the one wide shuffle is lineitem⋈orders on orderkey.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    mkt_cust = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("c_custkey")
    )
    supp_n = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    vol = F.expr(_REV_CENTS100)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(mkt_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0)))
            .cast("decimal(38,0)")
            .alias("nation_volume_cents100"),
            F.sum(vol).cast("decimal(38,0)").alias("total_volume_cents100"),
        )
        .orderBy("o_year")
    )


O_AGG_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_1' THEN {_REV_CENTS100_SQL}
                     ELSE 0 END) AS DECIMAL(38,0)) AS nation_volume_cents100,
       CAST(sum({_REV_CENTS100_SQL}) AS DECIMAL(38,0)) AS total_volume_cents100
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = 'STANDARD'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE')
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q15 — top supplier: aggregate ⋈ scalar-max of itself
# --------------------------------------------------------------------------


def q_agg_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue per supplier over a quarter, then keep the
    supplier(s) achieving the maximum — the "aggregate joined to a scalar
    aggregate of itself" pattern.

    Integer-cents revenue makes the equality-with-max exact.  Scale: the
    per-supplier aggregate is one shuffle; the scalar max is one row,
    broadcast back.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.expr(_REV_CENTS100)).cast("decimal(38,0)").alias("total_revenue_cents100"))
    )
    mx = rev.agg(F.max("total_revenue_cents100").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue_cents100") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents100")
        .orderBy("s_suppkey")
    )


O_AGG_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum({_REV_CENTS100_SQL}) AS DECIMAL(38,0)) AS total_revenue_cents100
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_cents100
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_cents100 = (SELECT max(total_revenue_cents100) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: avg-correlated subquery
# --------------------------------------------------------------------------


def q_agg_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20% of
    the part's average quantity — the correlated-average subquery, expressed
    as a per-part aggregate joined back to the fact.

    The `qty < 0.2 * avg(qty)` comparison is cross-multiplied into pure
    integers (5·qty_cents·cnt < sum_qty_cents) so neither engine divides.
    Brand filter stands in for the missing container column.  Scale: the
    per-part aggregate and the back-join both key on partkey — one
    repartition serves both sides (and the filtered part dim broadcasts).
    """
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 20)
    )
    li = _t(spark, sf_dir, "lineitem")
    qty = "cast(round(l_quantity * 100) as bigint)"
    li_p = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li_p.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.expr(qty)).alias("sum_qty_cents"), F.count("*").alias("cnt")
    )
    return (
        li_p.join(per_part, F.col("l_partkey") == F.col("pk"))
        .where(F.expr(qty) * 5 * F.col("cnt") < F.col("sum_qty_cents"))
        .agg(
            F.sum(F.expr("cast(round(l_extendedprice * 100) as decimal(18,0))"))
            .cast("decimal(38,0)")
            .alias("small_qty_price_cents")
        )
    )


O_AGG_Q17 = """
WITH li_p AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13' AND p_size < 20
), per_part AS (
  SELECT l_partkey AS pk,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_cents,
         count(*) AS cnt
  FROM li_p GROUP BY 1
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(18,0)))
            AS DECIMAL(38,0)) AS small_qty_price_cents
FROM li_p JOIN per_part ON l_partkey = pk
WHERE CAST(round(l_quantity * 100) AS BIGINT) * 5 * cnt < sum_qty_cents
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: double-correlated EXISTS
# --------------------------------------------------------------------------


def q_agg_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: for finished multi-supplier orders, the supplier
    whose line shipped strictly last (adapted: shipdate ranks replace the
    missing commit/receipt dates).  The reference query's
    EXISTS(other supplier) AND NOT EXISTS(other supplier shipped later)
    pair collapses to: this supplier's latest line is the order's unique
    maximum, and another supplier exists.

    Implemented window-free of self-joins: one per-(order, supplier)
    aggregate, then order-level window ranks.  Scale: both the aggregate
    and the window partition on orderkey — a single exchange serves both.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    per = (
        li.join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "*",
        F.max("supp_last").over(w).alias("order_last"),
        F.count("*").over(w).alias("n_supp"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)).over(w),
    )
    return (
        flagged.where(
            (F.col("n_supp") > 1)
            & (F.col("n_at_max") == 1)
            & (F.col("supp_last") == F.col("order_last"))
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


O_AGG_Q21 = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY 1, 2
), w1 AS (
  SELECT *,
         max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per
), flagged AS (
  SELECT *,
         sum(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM w1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_at_max = 1 AND supp_last = order_last
GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 20
"""


TPCH_REGISTRY: dict[str, tuple] = {
    "agg_q8_market_share": (q_agg_q8_market_share, O_AGG_Q8),
    "agg_q15_top_supplier": (q_agg_q15_top_supplier, O_AGG_Q15),
    "agg_q17_small_qty_revenue": (q_agg_q17_small_qty_revenue, O_AGG_Q17),
    "agg_q21_waiting_supplier": (q_agg_q21_waiting_supplier, O_AGG_Q21),
}
