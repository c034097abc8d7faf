"""Q2 / Q8 / Q9 / Q11 / Q15 / Q16 / Q17 / Q20 / Q21 — TPC-H closure.

With Q1/Q3/Q5/rollup (queries.py) and Q4/Q6/Q7/Q10/Q12/Q13/Q14/Q18/Q19/Q22
(queries_ext.py) this completes all 22 TPC-H query *shapes*.  The fixture
has no `partsupp` and lineitem carries no commitdate/receiptdate/shipmode/
container columns, so the five partsupp queries (Q2/Q9/Q11/Q16/Q20) run on
a DERIVED partsupp view — `_partsupp()` below, one aggregate over lineitem
on (l_partkey, l_suppkey) that both engines rebuild identically — and
Q17/Q21 run adapted predicates on the columns that exist.  In every case
the preserved artifact is the plan shape (join topology, correlation
pattern, aggregation structure), which is the thing being tested.

Determinism: every money aggregate is integer cents (`round(x*100)`)
summed in DECIMAL, cast to BIGINT once at the end (output columns must
never be DECIMAL/HUGEINT — pandas renders those as Decimal/float64 and
the driver's value-hash then mismatches, see COVERAGE.md "Oracle type
contract"); every ratio is returned as a
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
            .cast("bigint")
            .alias("nation_volume_cents100"),
            F.sum(vol).cast("bigint").alias("total_volume_cents100"),
        )
        .orderBy("o_year")
    )


O_AGG_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_1' THEN {_REV_CENTS100_SQL}
                     ELSE 0 END) AS BIGINT) AS nation_volume_cents100,
       CAST(sum({_REV_CENTS100_SQL}) AS BIGINT) AS total_volume_cents100
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
        .agg(F.sum(F.expr(_REV_CENTS100)).cast("bigint").alias("total_revenue_cents100"))
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
         CAST(sum({_REV_CENTS100_SQL}) AS BIGINT) AS total_revenue_cents100
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
            .cast("bigint")
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
            AS BIGINT) AS small_qty_price_cents
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


# --------------------------------------------------------------------------
# Derived partsupp — shared by the Q2/Q9/Q11/Q16/Q20 shapes
# --------------------------------------------------------------------------


def _partsupp(spark, sf_dir):
    """Deterministic partsupp stand-in derived from lineitem.

    One row per (l_partkey, l_suppkey):
      ps_supplycost_cents = min(round(l_extendedprice*100))  — integer min
      ps_availqty_cents   = sum(round(l_quantity*100))       — integer sum
    min/sum over integers are order-independent, so Spark's partial
    aggregation and DuckDB's serial scan agree bit-for-bit.  Scale: one
    shuffle on the composite key; at 100 TB this view would be a bucketed
    materialization shared by all five queries.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.expr("cast(round(l_extendedprice * 100) as bigint)")).alias(
            "ps_supplycost_cents"
        ),
        F.sum(F.expr("cast(round(l_quantity * 100) as bigint)")).alias(
            "ps_availqty_cents"
        ),
    )


_PARTSUPP_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ps_supplycost_cents,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS ps_availqty_cents
  FROM lineitem GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated-min subquery over partsupp
# --------------------------------------------------------------------------


def q_agg_q2_min_cost_supp(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering the minimum supply cost — the correlated-min subquery, here a
    window min over the region-restricted partsupp.

    Scale: partsupp shuffles once on ps_partkey (serving both the window
    and the part join); supplier/nation/region broadcast.
    """
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "LARGE")
    )
    eu_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    eu_ps = ps.join(
        F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    ).withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
    return (
        eu_ps.where(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "ps_supplycost_cents",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


O_AGG_Q2 = f"""
WITH ps AS ({_PARTSUPP_SQL}),
eu_ps AS (
  SELECT ps.*, s_suppkey, s_name, s_acctbal, n_name,
         min(ps_supplycost_cents) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost_cents
FROM eu_ps
JOIN part ON ps_partkey = p_partkey AND p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
WHERE ps_supplycost_cents = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit: 5-way join incl. composite-key partsupp
# --------------------------------------------------------------------------


def q_agg_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by (supplier nation, order year) over parts
    matching a name predicate — lineitem ⋈ partsupp on the COMPOSITE
    (partkey, suppkey) key, plus part/orders/supplier/nation dims.

    profit is the all-integer form
      10000·rev_cents100 − qty_cents·ps_supplycost_cents
    (revenue scaled up instead of cost divided down — no division, so the
    DECIMAL sum is bit-identical across engines).  Scale: the composite-key
    join is the one wide shuffle; dims broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit = (
        F.expr(_REV_CENTS100).cast("decimal(38,0)") * 10000
        - F.expr("cast(round(l_quantity * 100) as decimal(38,0))")
        * F.col("ps_supplycost_cents")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("bigint").alias("profit_scaled"))
        .orderBy("nation", F.desc("o_year"))
    )


O_AGG_Q9 = f"""
WITH ps AS ({_PARTSUPP_SQL})
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST({_REV_CENTS100_SQL} AS DECIMAL(38,0)) * 10000
                - CAST(round(l_quantity * 100) AS DECIMAL(38,0))
                  * ps_supplycost_cents) AS BIGINT) AS profit_scaled
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q11 — important stock: group-aggregate vs global scalar threshold
# --------------------------------------------------------------------------


def q_agg_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part inventory value within one nation, kept
    only when it exceeds a fixed fraction of the nation's total — the
    scalar-subquery-threshold pattern.

    value = ps_supplycost_cents · ps_availqty_cents (integer product); the
    `part_value > 0.0001 × total` comparison is cross-multiplied to
    `part_value · 10000 > total` so no engine divides.  Scale: the
    per-part aggregate is one shuffle; the grand total is one row
    broadcast back (crossJoin of a 1-row DataFrame).
    """
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat_ps = ps.join(
        F.broadcast(
            s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
                "s_suppkey"
            )
        ),
        F.col("ps_suppkey") == F.col("s_suppkey"),
        "left_semi",
    ).withColumn(
        "value",
        (
            F.col("ps_supplycost_cents").cast("decimal(38,0)")
            * F.col("ps_availqty_cents")
        ),
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("value").cast("decimal(38,0)").alias("part_value_dec")
    )
    total = nat_ps.agg(F.sum("value").cast("decimal(38,0)").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value_dec") * 10000 > F.col("total_value"))
        .select(
            "ps_partkey", F.col("part_value_dec").cast("bigint").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


O_AGG_Q11 = f"""
WITH ps AS ({_PARTSUPP_SQL}),
nat_ps AS (
  SELECT ps.*,
         CAST(ps_supplycost_cents AS DECIMAL(38,0)) * ps_availqty_cents AS value
  FROM ps
  WHERE ps_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')
)
SELECT ps_partkey, CAST(sum(value) AS BIGINT) AS part_value
FROM nat_ps
GROUP BY 1
HAVING CAST(sum(value) AS DECIMAL(38,0)) * 10000 >
       (SELECT CAST(sum(value) AS DECIMAL(38,0)) FROM nat_ps)
ORDER BY part_value DESC, ps_partkey
"""


# --------------------------------------------------------------------------
# Q16 — supplier counts by part description: NOT-IN + count distinct
# --------------------------------------------------------------------------


def q_agg_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for parts outside one brand/type, excluding "complaint" suppliers —
    the NOT-IN anti-join + COUNT(DISTINCT) pattern.  Negative account
    balance stands in for the missing comment-LIKE complaint filter.

    Scale: part broadcast into partsupp; the anti-join side (bad
    suppliers) broadcasts; count distinct shuffles on the group key with
    partial aggregation.
    """
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


O_AGG_Q16 = f"""
WITH ps AS ({_PARTSUPP_SQL})
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q20 — heavy-1995 suppliers: nested semi-join chain
# --------------------------------------------------------------------------


def q_agg_q20_promo_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in one nation holding stock of name-
    matched parts whose 1995 shipments exceeded half their total quantity
    — the nested semi-join chain (supplier ⋉ partsupp ⋉ (part, dated
    lineitem aggregate)).

    The reference's `availqty > 0.5·qty` flips to `2·qty_1995 >
    ps_availqty_cents` (1995 shipments dominate) because derived availqty
    is total shipped quantity, which can never be under half of itself.
    Integer cross-multiply — no division.  Scale: the dated lineitem
    aggregate and partsupp both key on (partkey, suppkey); part and
    supplier broadcast.
    """
    ps = _partsupp(spark, sf_dir)
    li95 = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.expr("cast(round(l_quantity * 100) as bigint)")).alias(
                "qty95_cents"
            )
        )
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    heavy = (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            li95,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("qty95_cents") * 2 > F.col("ps_availqty_cents"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


O_AGG_Q20 = f"""
WITH ps AS ({_PARTSUPP_SQL}),
li95 AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty95_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY 1, 2
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM ps
  JOIN li95 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND qty95_cents * 2 > ps_availqty_cents)
ORDER BY s_name
"""


TPCH_REGISTRY: dict[str, tuple] = {
    "agg_q2_min_cost_supp": (q_agg_q2_min_cost_supp, O_AGG_Q2),
    "agg_q8_market_share": (q_agg_q8_market_share, O_AGG_Q8),
    "agg_q9_product_profit": (q_agg_q9_product_profit, O_AGG_Q9),
    "agg_q11_important_stock": (q_agg_q11_important_stock, O_AGG_Q11),
    "agg_q15_top_supplier": (q_agg_q15_top_supplier, O_AGG_Q15),
    "agg_q16_supplier_cnt": (q_agg_q16_supplier_cnt, O_AGG_Q16),
    "agg_q17_small_qty_revenue": (q_agg_q17_small_qty_revenue, O_AGG_Q17),
    "agg_q20_promo_suppliers": (q_agg_q20_promo_suppliers, O_AGG_Q20),
    "agg_q21_waiting_supplier": (q_agg_q21_waiting_supplier, O_AGG_Q21),
}
