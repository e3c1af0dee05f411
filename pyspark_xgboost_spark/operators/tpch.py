"""End-to-end TPC-H-style analytics queries over the star schema.

The reference has no relational surface at all (SURVEY.md §2.2: joins,
aggregation ABSENT — ``sparkdl/xgboost/xgboost_core.py`` composes only
select/cast/repartition/mapInPandas); individual join/agg/window shapes
are covered one-per-operator in relational.py. These two queries are the
*composed* workloads — multi-table join trees feeding grouped money
aggregates with top-k selection — adapted from TPC-H Q3 and Q5 to the
driver's schema (no ``o_shippriority``/``c_address`` columns; date
cutoffs sit mid-range of the generated 1995–2001 order dates).

Money math runs on exact integer cents (relational._cents) so revenue is
bit-identical under any partial-aggregation order and ties in the top-k
are broken deterministically by key — the same discipline the rest of
the relational suite uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.operators.relational import _cents
from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table

# revenue = sum(extendedprice * (1 - discount)) on integer cents:
# cents(price) * (100 - cents(discount)) summed exactly, then one final
# division back to currency units. Identical text in both engines.
_REVENUE_SQL = (
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)"
    " / 10000.0"
)


def _revenue() -> F.Column:
    return (F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))) / 10000.0)


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REVENUE_SQL} AS revenue,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-30'
      AND l_shipdate > TIMESTAMP '1998-06-30'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted: the 10 highest-revenue
    unshipped orders for one market segment.

    Plan shape: both fact filters (order date, ship date) are pushed to
    the parquet scans; the segment filter prunes customer to ~1/5 before
    it reaches the join. Join order is lineitem⨝orders on the shared
    o_orderkey shuffle key, then the pruned customer side — left to AQE,
    which broadcasts customer while it fits (it does at bench SF; at
    SF-100k it degrades gracefully to a shuffle join rather than OOM —
    the reason there is no hard broadcast() hint here). The top-10 is
    TakeOrderedAndProject (per-partition heap + driver merge of 10-row
    heads, never a global sort). Revenue ties at the cut are broken by
    l_orderkey so the selected set is deterministic."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    cutoff = F.lit("1998-06-30").cast("timestamp")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    agg = j.groupBy("l_orderkey", "o_orderdate").agg(_revenue().alias("revenue"))
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            # o_orderdate is TIMESTAMP_NTZ; session tz is UTC so the
            # cast to instant is lossless (same pattern as window_lag_lead)
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
        )
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_REVENUE_SQL} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where the
    ordering customer and the line's supplier share a nation inside one
    region — the classic snowflake join tree with a non-key equi
    condition (c_nationkey = s_nationkey).

    Plan shape: region⨝nation collapses to a broadcast-pruned nation
    dim (≤25 rows at any SF — hard broadcast() is safe and keeps the
    region filter map-side). supplier picks up (nationkey, n_name) from
    that broadcast, so the big probe chain is lineitem⨝orders (orderkey
    shuffle) ⨝customer (custkey shuffle) ⨝supplier-with-nation
    (broadcast at bench SF via AQE; suppkey shuffle beyond). The
    c_nationkey = s_nationkey restriction rides the supplier join as an
    extra conjunct — no separate pass. Final agg is 5 groups; partial
    aggregation collapses everything map-side before one tiny shuffle."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return j.groupBy("n_name").agg(_revenue().alias("revenue"))


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)
             / 1000000.0 AS sum_charge,
           CAST(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / count(*) AS avg_qty,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 100.0 / count(*) AS avg_price,
           CAST(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 100.0 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): full-relation scan-aggregate
    into a handful of (returnflag, linestatus) groups.

    The canonical map-side-combine workload: the ship-date filter is
    pushed to the parquet scan, every partition pre-aggregates to ~4
    groups, and the exchange moves only num_partitions x 4 rows — at
    100 TB the shuffle is KB-sized regardless of input size. All money
    sums run on exact integer cents (bit-identical under any partial-agg
    order); the averages divide two exactly-aggregated integers, so the
    double division is deterministic too. Quantities round to BIGINT on
    both engines (they are integral doubles in the generated data;
    DuckDB rounds double->int casts while Spark truncates, so the
    explicit round() keeps the engines aligned)."""
    qty = F.round(F.col("l_quantity")).cast("bigint")
    ext_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    tax_c = _cents("l_tax")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty.alias("qty"),
            ext_c.alias("ext_c"),
            disc_c.alias("disc_c"),
            tax_c.alias("tax_c"),
        )
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        (F.sum("ext_c") / 100.0).alias("sum_base_price"),
        (F.sum(F.col("ext_c") * (100 - F.col("disc_c"))) / 10000.0).alias(
            "sum_disc_price"
        ),
        (
            F.sum(F.col("ext_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c")))
            / 1000000.0
        ).alias("sum_charge"),
        (F.sum("qty").cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum("ext_c").cast("double") / 100.0 / F.count("*")).alias("avg_price"),
        (F.sum("disc_c").cast("double") / 100.0 / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
           total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer), adapted: top-100 orders whose
    total quantity exceeds a threshold, joined back to order + customer.

    Plan shape for scale: the HAVING aggregate runs FIRST, on integer
    quantities with map-side combine, shrinking the fact table to the
    handful of qualifying orderkeys before any join happens. The join
    back to orders shuffles only the survivors (AQE broadcasts them once
    the aggregate output is observed to be small); customer attaches the
    same way. The top-100 is TakeOrderedAndProject — per-partition heaps
    merged on the driver, never a global sort. Ties at the cut are
    broken by o_orderkey so the selected set is deterministic."""
    qty = F.round(F.col("l_quantity")).cast("bigint")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", qty.alias("qty"))
        .groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "total_qty",
        )
    )


@register(
    "tpch_q6_revenue_change",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure predicate-pushdown
    workload — a single scan-aggregate whose three filters (ship-date
    range, discount band, quantity cap) all reach the parquet reader, so
    row groups outside the year are never decompressed and no join or
    wide shuffle exists at any scale. The discount band compares exact
    integer cents (a double equality band like 0.05..0.07 is the classic
    float-comparison trap; cents are exact). Revenue multiplies two
    exact cent integers and divides once at the end."""
    disc_c = _cents("l_discount")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & disc_c.between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        (F.sum(_cents("l_extendedprice") * disc_c) / 10000.0).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted to the driver schema:
    orders placed in one quarter that had at least one LATE line
    (shipped more than 90 days after the order date — the schema has no
    commit/receipt dates, so lateness is ship-vs-order), counted by
    priority.

    Plan shape: the quarter filter prunes orders at the scan; the EXISTS
    becomes a LEFT SEMI join (one line match short-circuits — no
    duplicate explosion, no distinct pass), with the correlated
    date predicate riding the join as a non-equi conjunct. The semi
    join shuffles on orderkey; the final aggregate is 5 groups,
    collapsed map-side."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(round(c_acctbal * 100) AS BIGINT) / 100.0 AS acctbal,
           {_REVENUE_SQL} AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1998-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): the 20 customers who lost
    the most revenue to returns in one quarter, with their nation.

    Plan shape: both selective filters (quarter, returnflag) are pushed
    to the scans BEFORE the joins, so the orderkey shuffle moves only
    returned lines of one quarter's orders; nation (25 rows) is a hard
    broadcast; customer attaches by custkey with AQE free to broadcast
    the shrunken order-side. Top-20 is TakeOrderedAndProject with ties
    broken by c_custkey. Account balance is grouped/output as exact
    cents-derived currency so both engines hash identically."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", (_cents("c_acctbal") / 100.0).alias("acctbal")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name", "acctbal").agg(
        _revenue().alias("revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "acctbal", "revenue")
    )


@register(
    "tpch_q12_late_lines_by_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority), adapted: lines shipped
    late (60+ days after ordering) in one year, pivoted into
    high-priority vs low-priority counts per return flag. (The driver
    schema has no l_shipmode/commit/receipt dates; the essence kept is
    the join + theta lateness predicate + conditional aggregation.)

    Plan shape: the year filter is pushed to the lineitem scan; the
    equi join shuffles on orderkey with the lateness comparison
    evaluated as a post-join filter conjunct (it references both
    sides, so no engine can push it below the join); the two CASE
    counts collapse map-side into 3 groups."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS BIGINT) AS promo_rev_e4,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             AS total_rev_e4,
           100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS BIGINT)
             / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the share of one month's revenue
    attributable to promotional parts.

    Plan shape: the month filter prunes the lineitem scan to ~1/80 of
    the fact table; part is a hard broadcast (it is a slowly-growing
    dimension), so no shuffle of the fact side exists — the aggregate
    is a single global row assembled from map-side partials. Both the
    numerator and denominator are exact integer cent-products; the
    percentage divides the two integers once, deterministically, and
    both integers are ALSO output so the oracle pins them exactly."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0)).alias(
            "promo_rev_e4"
        ),
        F.sum(rev).alias("total_rev_e4"),
        (
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
            / F.sum(rev)
        ).alias("promo_pct"),
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / count(*) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           count(*) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS totacctbal
    FROM customer c, avg_bal
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.avg_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: per nation, the
    count and total balance of above-average-balance customers with no
    RECENT order — the lapsed-customer opportunity list. (The schema
    has no phone country code, so the nation key plays that role; and
    the generated data gives every customer at least one order, so the
    anti-join target is the recent-order subset, keeping the result
    non-trivial.)

    Plan shape: the scalar average is ONE tiny aggregate job whose
    single row Catalyst folds into the filter as a literal-like
    broadcast (no per-row subquery). NOT EXISTS becomes a LEFT ANTI
    join on custkey — at 100 TB the anti join shuffles customer once
    against the orders keyset; AQE can flip the small side to
    broadcast. The balance threshold compares exact cents against the
    exact-integer-derived average (a deterministic double), and the
    output total re-aggregates exact cents per nation."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_c")
    )
    # scalar subquery: average positive balance, on exact cents
    avg_cents = (
        cust.filter(F.col("bal_c") > 0)
        .agg((F.sum("bal_c").cast("double") / F.count("*")).alias("avg_cents"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(avg_cents)).filter(
        F.col("bal_c") > F.col("avg_cents")
    )
    no_orders = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        (F.sum("bal_c") / 100.0).alias("totacctbal"),
    )
