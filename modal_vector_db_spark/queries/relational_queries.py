"""Relational extension surface (SURVEY §2.3-2.7 planned rows): joins,
grouped/rollup aggregation, window functions, set ops, top-k — all built-in
DataFrame ops so Catalyst picks broadcast vs sort-merge, pushes filters, and
prunes columns.

Float parity note: double SUMs over 100k+ rows drift between engines by more
than any fixed rounding can absorb (summation order).  Aggregates therefore
cast inputs to DECIMAL(18,4) — exact arithmetic, identical in both engines —
then cast the final value back to DOUBLE and round.  At 100 TB you'd keep
doubles for speed and tolerate non-bitwise-reproducible sums; the decimal
path is the correctness-gate configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from modal_vector_db_spark.harness import load, register

DEC = "decimal(18,4)"


def _dsum(col, alias: str):
    return F.round(F.sum(F.col(col).cast(DEC)).cast("double"), 4).alias(alias)


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity::DECIMAL(18,4))::DOUBLE, 4) AS sum_qty,
           round(sum(l_extendedprice::DECIMAL(18,4))::DOUBLE, 4) AS sum_base_price,
           round(sum((l_extendedprice::DECIMAL(18,4)) * (1 - l_discount::DECIMAL(18,4)))::DOUBLE, 4) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation.  Plan: partial
    (map-side) agg → shuffle on 2 low-cardinality keys → final agg; the
    shipdate filter is pushed to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum((l.l_extendedprice::DECIMAL(18,4)) * (1 - l.l_discount::DECIMAL(18,4)))::DOUBLE, 4) AS revenue,
           o.o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.

    No explicit broadcast hints: customer/orders are fact-sized (they grow
    with the data), so a forced broadcast OOMs the build side at 100×.
    Catalyst's size estimates / AQE runtime stats pick broadcast when the
    filtered sides are actually small (verified in tests/test_plans.py) and
    fall back to shuffle joins when they are not.  Final ORDER BY+LIMIT is
    TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(revenue).cast("double"), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum((l.l_extendedprice::DECIMAL(18,4)) * (1 - l.l_discount::DECIMAL(18,4)))::DOUBLE, 4) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join.  Only the fixed-cardinality dims
    (nation: 25 rows, region: 5 rows) carry explicit broadcast hints;
    orders/customer/supplier grow with the data, so their join strategy is
    left to Catalyst/AQE (broadcast at small SF, shuffle join at 100 TB).
    The only unavoidable shuffle is the final small groupBy(n_name)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (F.col("l_suppkey") == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 4).alias("revenue"))
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT round(sum((l_extendedprice::DECIMAL(18,4)) * (l_discount::DECIMAL(18,4)))::DOUBLE, 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — every predicate pushes to parquet;
    single scalar out (no shuffle at all under AQE partial agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)).cast(
                    "double"
                ),
                4,
            ).alias("revenue")
        )
    )


@register(
    "join_coverage",
    oracle="""
    SELECT 'outer' AS tag, n.n_name AS key, count(s.s_suppkey) AS n,
           NULL::DOUBLE AS v
    FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    UNION ALL
    SELECT 'semi', 'semi', count(*), NULL::DOUBLE FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'anti', 'anti', count(*), NULL::DOUBLE FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'bcast', p.p_brand, count(*),
           round(sum(l.l_quantity::DECIMAL(18,4))::DOUBLE, 4)
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 2
    GROUP BY p.p_brand
    UNION ALL
    SELECT 'q8', year(o.o_orderdate)::VARCHAR, count(*),
           round((sum(CASE WHEN n2.n_name = 'NATION_7'
                           THEN (l.l_extendedprice::DECIMAL(18,4)) * (1 - l.l_discount::DECIMAL(18,4))
                           ELSE 0 END)::DOUBLE)
                 / (sum((l.l_extendedprice::DECIMAL(18,4)) * (1 - l.l_discount::DECIMAL(18,4)))::DOUBLE), 6)
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY year(o.o_orderdate)
    UNION ALL
    SELECT 'q9', n.n_name || '/' || year(o.o_orderdate)::VARCHAR, count(*),
           round(sum((l.l_extendedprice::DECIMAL(18,4)) * (1 - l.l_discount::DECIMAL(18,4))
                     - (p.p_retailprice::DECIMAL(18,4)) * (l.l_quantity::DECIMAL(18,4)))::DOUBLE, 4)
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    UNION ALL
    SELECT 'q21', s.s_name, count(*), NULL::DOUBLE
    FROM (SELECT l.l_orderkey, l.l_suppkey,
                 (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F') l1
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
                  WHERE o2.o_orderstatus = 'F' AND l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                      WHERE o3.o_orderstatus = 'F' AND l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
)
def join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-type coverage in one tagged union, one job: LEFT OUTER with
    nulls surviving into count() (per-nation supplier histogram), LEFT SEMI
    and LEFT ANTI (the S5 write protocol's building blocks) as single-row
    count arms, the explicit broadcast-hash fact⨝dim
    (:func:`join_broadcast_part`) as per-brand (count, sum_qty) rows, and
    the three TPC-H join shapes the singleton entries don't cover: q8
    (8-table two-role-nation join + conditional market share), q9 (profit
    rollup; partsupp absent from the fixture so supplycost is proxied by
    p_retailprice), and q21 (only-late-supplier, decorrelated to one
    per-order aggregate instead of EXISTS/NOT-EXISTS fact self-joins —
    the oracle keeps the textbook correlated form as a cross-check).
    With subquery_coverage's q4/q11/q15/q16/q20 arms this completes the
    22-query TPC-H shape inventory (q2's argmin-per-group = q15's arm)."""
    nul = F.lit(None).cast("double").alias("v")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    outer = (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n"))
        .select(F.lit("outer").alias("tag"), F.col("n_name").alias("key"), "n", nul)
    )
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("semi").alias("tag"), F.lit("semi").alias("key"), "n", nul)
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("anti").alias("tag"), F.lit("anti").alias("key"), "n", nul)
    )
    bcast = join_broadcast_part(spark, sf_dir).select(
        F.lit("bcast").alias("tag"),
        F.col("p_brand").alias("key"),
        F.col("n_lines").alias("n"),
        F.col("sum_qty").alias("v"),
    )

    # --- TPC-H q8 shape: two-role nation join + conditional market share.
    # nation appears under two aliases (customer side n1, supplier side n2);
    # only the fixed-cardinality dims carry hints — part is type-filtered
    # (1/6 of a linearly-growing table) so its strategy is left to AQE.
    li = load(spark, sf_dir, "lineitem")
    p8 = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o8 = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    su = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("n2_name"))
    r8 = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    q8 = (
        li.join(p8, li.l_partkey == p8.p_partkey)
        .join(o8, F.col("l_orderkey") == o8.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r8), F.col("n1_region") == F.col("r_regionkey"))
        .join(su, F.col("l_suppkey") == su.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    F.when(F.col("n2_name") == "NATION_7", vol).otherwise(F.lit(0).cast(DEC))
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("v"),
        )
        .select(F.lit("q8").alias("tag"), F.col("yr").cast("string").alias("key"), "n", "v")
    )

    # --- TPC-H q9 shape: profit rollup by (supplier nation, order year) with
    # a LIKE part filter.  The fixture has no partsupp, so ps_supplycost is
    # proxied by p_retailprice (two-factor decimal product — a third decimal
    # factor would trip Spark's precision-loss truncation vs DuckDB).
    p9 = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    amount = vol - F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    q9 = (
        li.join(p9, li.l_partkey == p9.p_partkey)
        .join(su, F.col("l_suppkey") == su.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(amount).cast("double"), 4).alias("v"),
        )
        .select(
            F.lit("q9").alias("tag"),
            F.concat(F.col("n_name"), F.lit("/"), F.col("yr").cast("string")).alias("key"),
            "n",
            "v",
        )
    )

    # --- TPC-H q21 shape: "only late supplier in a multi-supplier order".
    # The textbook form is EXISTS + NOT EXISTS self-joins on lineitem (the
    # oracle keeps that form as a cross-check); here both correlated
    # predicates decorrelate into ONE per-order aggregate — distinct
    # suppliers >= 2 and distinct LATE suppliers == 1 — turning two extra
    # fact-fact joins into a single reusable groupBy(orderkey) pass.
    of = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = li.join(of, li.l_orderkey == of.o_orderkey).select(
        F.col("l_orderkey").alias("lo_orderkey"),
        F.col("l_suppkey").alias("lo_suppkey"),
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
    )
    per_order = lo.groupBy("lo_orderkey").agg(
        F.countDistinct("lo_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("lo_suppkey"))).alias("nlate"),
    )
    q21 = (
        lo.filter(F.col("late"))
        .join(per_order, "lo_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .join(su, F.col("lo_suppkey") == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("q21").alias("tag"), F.col("s_name").alias("key"), "n", nul)
    )

    out = outer.union(semi).union(anti).union(bcast)
    return out.union(q8).union(q9).union(q21)


@register(
    "window_topn_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) t
    WHERE rn <= 2
    """,
)
def window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function: top-2 orders per customer (§2.5 surface).
    One shuffle on the partition key; rank evaluated streaming per group."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "window_running_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice::DECIMAL(18,4))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE, 4)
             AS running_spend,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate ASC, o_orderkey ASC),
                     o_orderdate)::BIGINT AS days_since_prev
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
)
def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows sharing one (partition, order): cumulative spend
    with an explicit ROWS frame + lag() day-gap.  Same window spec for both
    measures ⇒ Catalyst evaluates them in ONE Window operator over ONE
    shuffle — the reason to merge rather than run two scans.

    The deterministic 10%-of-customers restriction bounds the DRIVER
    result (full-fact per-row window output is a collect bottleneck, not a
    cluster one); it is on the window's partition key, so both engines
    push it below the window with identical emitted rows, and every
    running-sum/lag value for the sampled customers is still verified."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    order = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_sum = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("o_custkey").orderBy(*order)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w_sum).cast("double"), 4).alias(
            "running_spend"
        ),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w_lag))
        .cast("long")
        .alias("days_since_prev"),
    )


@register(
    "setops_coverage",
    oracle="""
    SELECT 'intersect' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 1000
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ) t
    UNION ALL
    SELECT 'except_union', count(*) FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 1000
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey FROM customer WHERE c_acctbal <= 0
    ) t
    """,
)
def setops_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface (§2.7) in one tagged union: INTERSECT, and
    EXCEPT + UNION ALL composition."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    d = c.filter(F.col("c_acctbal") <= 0).select("c_custkey")
    inter = (
        a.intersect(b)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect").alias("tag"), "n")
    )
    exu = (
        a.exceptAll(b)
        .union(d)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_union").alias("tag"), "n")
    )
    return inter.union(exu)


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT 'rollup' AS tag, l_returnflag AS k1, l_linestatus AS k2, count(*) AS n,
           round(sum(l_quantity::DECIMAL(18,4))::DOUBLE, 4) AS val
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube', o_orderstatus, o_orderpriority, count(*),
           round(sum(o_totalprice::DECIMAL(18,4))::DOUBLE, 4)
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: hierarchical ROLLUP over lineitem + full CUBE
    over orders, tagged and unioned (both expand to grouping-set Expand +
    one partial-agg shuffle each)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    roll = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _dsum("l_quantity", "val"))
        .select(
            F.lit("rollup").alias("tag"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "n",
            "val",
        )
    )
    cube = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), _dsum("o_totalprice", "val"))
        .select(
            F.lit("cube").alias("tag"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "n",
            "val",
        )
    )
    return roll.union(cube)


def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate + min/max in one pass."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


def join_broadcast_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: highly-filtered dim `part` broadcast to
    every executor; the lineitem fact never shuffles for the join (only the
    tiny final agg).

    Hint policy (tests/test_plans.py): a hint is acceptable only because the
    build side is highly filtered (p_size ≤ 2 keeps ~4% of part — two orders
    below the fact).  The previous p_size ≤ 20 kept ~40% of a linearly-
    growing table behind a forced hint — an OOM at 100× (round-2 verdict)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 2)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), _dsum("l_quantity", "sum_qty"))
    )
