"""TPC-H completion set: the 12 queries (Q2/7/8/9/11/13/15/16/17/19/20/21)
that round 4 left on the table, closing the suite at 22/22.

The reference has no relational surface (SURVEY.md §2.2 — its only
dataflow is select/cast/repartition/mapInPandas in
``sparkdl/xgboost/xgboost_core.py``); this module is §2.3 extension
surface. Queries are adapted to the driver schema the same way
tpch.py's ten are:

* there is no ``partsupp`` table — the observed ``lineitem``
  (partkey, suppkey) pairs are the part↔supplier bridge, with
  min/sum of exact line cents standing in for ps_supplycost /
  ps_availqty;
* there are no commit/receipt dates or ship modes — "late" is
  ship-vs-order lateness (same rule tpch.py Q4/Q12 use);
* there is no phone/comment/container column — complaint and
  container filters map to s_acctbal sign and p_size/p_brand bands.

Money math runs on exact integer cents (relational._cents) so every
sum is bit-identical under any partial-aggregation order, and every
DuckDB oracle CASTs its sums to BIGINT (the round-4 HUGEINT lesson,
enforced by tests/test_oracle_typing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.operators.relational import _cents
from pyspark_xgboost_spark.operators.tpch import _REVENUE_SQL, _revenue
from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


_QTY = "CAST(round(l_quantity) AS BIGINT)"
_EXT_C = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_DISC_C = "CAST(round(l_discount * 100) AS BIGINT)"


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min({_EXT_C}) AS cost_c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eur AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), pc AS (
      SELECT p_partkey, cost_c, s_suppkey, s_name, s_acctbal, n_name
      FROM part
      JOIN cost ON p_partkey = l_partkey
      JOIN eur ON l_suppkey = s_suppkey
      WHERE p_size BETWEEN 10 AND 15 AND p_type = 'LARGE'
    ), mn AS (
      SELECT p_partkey AS mpk, min(cost_c) AS min_cost
      FROM pc GROUP BY p_partkey
    )
    SELECT CAST(round(s_acctbal * 100) AS BIGINT) / 100.0 AS acctbal,
           s_name, n_name, p_partkey, s_suppkey, cost_c
    FROM pc JOIN mn ON p_partkey = mpk AND cost_c = min_cost
    ORDER BY acctbal DESC, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: for each LARGE part in
    a size band, the European supplier(s) offering it at the lowest
    observed line price (no partsupp table — min exact line cents over
    the lineitem bridge stands in for ps_supplycost).

    Plan shape for scale: lineitem is pruned BEFORE its aggregate by two
    broadcast semi joins (the filtered part keys and the European
    supplier keys — both dimension-sized), so the (partkey, suppkey)
    min-cost groupBy shuffles only matching lines. The per-part minimum
    is a second tiny aggregate over pair-level rows joined back on
    (partkey, cost) — never a window over the fact table. Top-100 is
    TakeOrderedAndProject with ties broken by the unique (partkey,
    suppkey)."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    eur = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", _cents("s_acctbal").alias("bal_c"), "n_name")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", _cents("l_extendedprice").alias("ext_c"))
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            F.broadcast(eur.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(F.min("ext_c").alias("cost_c"))
    mn = cost.groupBy("l_partkey").agg(F.min("cost_c").alias("min_cost")).withColumnRenamed("l_partkey", "mpk")
    best = cost.join(
        mn, (F.col("l_partkey") == F.col("mpk")) & (F.col("cost_c") == F.col("min_cost"))
    )
    out = best.join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        out.select(
            (F.col("bal_c") / 100.0).alias("acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "cost_c",
        )
        .orderBy(F.col("acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_REVENUE_SQL} AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue shipped between two specific
    nations (either direction) by ship year.

    Plan shape: both nation restrictions prune BEFORE the big joins —
    supplier and customer each broadcast-join the 25-row nation dim and
    keep only the two named nations, so the orderkey/custkey shuffles
    move only candidate lines; the either-direction constraint is the
    one predicate that genuinely needs both sides and rides post-join.
    Final agg is ≤ 2×2 year-groups, collapsed map-side."""
    two = ["NATION_1", "NATION_2"]
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(two))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(two))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1999-01-01"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
    ).agg(_revenue().alias("revenue"))


@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH allrev AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_EXT_C} * (100 - {_DISC_C}) AS rev_e4,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN part ON p_partkey = l_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)
                AS BIGINT) AS nation_rev_e4,
           CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
           100.0 * CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4
                            ELSE 0 END) AS BIGINT)
             / CAST(sum(rev_e4) AS BIGINT) AS mkt_share_pct
    FROM allrev
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of ECONOMY-
    part revenue sold into one region's customers, per order year.

    Plan shape: region⨝nation collapses to a broadcast customer-nation
    prune (region filter never touches the fact table); part (type
    filter) and supplier (nation name attach) are broadcast too, so the
    only wide shuffles are lineitem⨝orders and ⨝customer on their
    natural keys. The share is numerator/denominator of two exact e4
    integers — both are ALSO output so the oracle pins them exactly
    (same discipline as Q14's promo_pct)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cnat = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("c_custkey")
    )
    snat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    is_n3 = F.col("supp_nation") == "NATION_3"
    return j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.sum(F.when(is_n3, rev).otherwise(0)).alias("nation_rev_e4"),
        F.sum(rev).alias("total_rev_e4"),
        (
            100.0 * F.sum(F.when(is_n3, rev).otherwise(0)) / F.sum(rev)
        ).alias("mkt_share_pct"),
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(amount_e4) AS BIGINT) AS profit_e4,
           CAST(sum(amount_e4) AS BIGINT) / 10000.0 AS profit
    FROM (
      SELECT n_name, o_orderdate,
             {_EXT_C} * (100 - {_DISC_C})
               - CAST(round(p_retailprice * 100) AS BIGINT) * {_QTY} * 100
               AS amount_e4
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%red%'
    ) amounts
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: profit on 'red' parts by
    supplier nation and order year, with p_retailprice × quantity as the
    supply-cost leg (no partsupp.ps_supplycost in the schema).

    Plan shape: the name filter prunes part to ~1/8 and rides a
    broadcast join into the lineitem scan (with retailprice attached);
    supplier+nation broadcast the nation name in; the single wide
    shuffle is lineitem⨝orders on orderkey. Profit is an exact e4
    integer per line (two cent-products), so the nation×year sums are
    partial-aggregation-order-proof; the e4 integer is output alongside
    the currency double."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", _cents("p_retailprice").alias("retail_c"))
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    qty = F.round(F.col("l_quantity")).cast("bigint")
    amount = _cents("l_extendedprice") * (100 - _cents("l_discount")) - F.col(
        "retail_c"
    ) * qty * 100
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy(
        "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.sum(amount).alias("profit_e4"),
        (F.sum(amount) / 10000.0).alias("profit"),
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey,
             CAST(sum({_EXT_C}) AS BIGINT) AS value_c
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value_c, value_c / 100.0 AS value
    FROM pv
    WHERE value_c > (SELECT CAST(sum(value_c) AS BIGINT) FROM pv) * 0.001
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: parts whose
    traded value through one nation's suppliers exceeds 0.1% of that
    nation's total traded value (observed lineitem cents stand in for
    ps_supplycost × ps_availqty).

    Plan shape: the nation's supplier keys broadcast-semi-prune the
    lineitem scan to 1/25 BEFORE the per-part aggregate; the grand
    total is a second aggregation of the (small) per-part result —
    Catalyst folds its single row in as a broadcast, so no per-row
    subquery exists. Threshold compares an exact BIGINT against
    exact-total × literal — deterministic on both engines."""
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", _cents("l_extendedprice").alias("ext_c"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    pv = li.groupBy("l_partkey").agg(F.sum("ext_c").alias("value_c"))
    total = pv.agg(F.sum("value_c").alias("grand_c"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_c") > F.col("grand_c") * 0.001)
        .select("l_partkey", "value_c", (F.col("value_c") / 100.0).alias("value"))
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): the histogram of order counts
    per customer, zero-order customers included (the comment-pattern
    exclusion maps to dropping '5-LOW' priority orders).

    Plan shape: the priority filter lands on the orders scan BEFORE the
    left join (put in the join condition in SQL, pre-filtered here —
    identical semantics for LEFT joins); the left join shuffles on
    custkey, the per-customer count collapses map-side, and the final
    histogram is a ~30-group aggregate over one row per customer.
    count(o_orderkey) skips the nulls left by customers with no
    qualifying order on both engines."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey,
             CAST(sum({_EXT_C} * (100 - {_DISC_C})) AS BIGINT) AS total_rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev_e4,
           total_rev_e4 / 10000.0 AS total_rev
    FROM srev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM srev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with the maximum
    revenue in one quarter (the view in the official query is the
    ``srev`` aggregate here).

    Plan shape: the quarter filter is pushed to the scan; per-supplier
    revenue collapses map-side to ≤ |supplier| rows; the max is ONE
    scalar over that small aggregate, broadcast back as a filter — the
    fact table is scanned exactly once. Revenue is an exact e4 integer,
    so the max-equality selects ties exactly (no double epsilon)."""
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    srev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .select("l_suppkey", rev.alias("rev"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev").alias("total_rev_e4"))
    )
    mx = srev.agg(F.max("total_rev_e4").alias("max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_rev_e4") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            "total_rev_e4",
            (F.col("total_rev_e4") / 10000.0).alias("total_rev"),
        )
    )


@register(
    "tpch_q16_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (5, 15, 25, 35, 45)
      AND s_acctbal >= 0
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: distinct
    supplier counts per (brand, type, size) over the lineitem bridge
    (no partsupp), excluding one brand, one type, and suppliers with a
    negative balance (the complaint filter of the official query).

    Plan shape: both dimension filters broadcast-prune the fact scan —
    part's brand/type/size predicate removes ~90% of part keys and
    rides a broadcast join; the in-good-standing supplier keyset is a
    broadcast semi. The count-distinct shuffles (partkey-group ×
    suppkey) pairs once; Spark expands distinct aggregation into a
    two-phase partial-dedup exactly like DuckDB."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(5, 15, 25, 35, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    sup_ok = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(sup_ok), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return li.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey AS apk,
             CAST(sum({_QTY}) AS BIGINT) AS sq,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum({_EXT_C}) AS BIGINT) AS sum_ext_c,
           CAST(sum({_EXT_C}) AS BIGINT) / 100.0 / 7.0 AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON apk = l_partkey
    WHERE p_brand = 'Brand#2'
      AND {_QTY} < 0.2 * (CAST(sq AS DOUBLE) / cnt)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
    below-20%-of-average-quantity orders of one brand's parts were no
    longer taken (the generated data spans 7 years, hence /7).

    Plan shape: the correlated AVG becomes ONE per-part aggregate
    (integer sum + count, shuffled on partkey with map-side combine)
    joined back to the fact on the same partkey — Spark reuses the
    exchange; no per-row subquery. The brand filter broadcast-prunes
    both sides first. The threshold compares an integer quantity
    against 0.2 × (exact-int / exact-int): both engines compute the
    identical IEEE double, so the cut is deterministic."""
    qty = F.round(F.col("l_quantity")).cast("bigint")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", qty.alias("qty"), _cents("l_extendedprice").alias("ext_c")
    )
    li_brand = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    pa = (
        li_brand.groupBy(F.col("l_partkey").alias("apk"))
        .agg(F.sum("qty").alias("sq"), F.count("*").alias("cnt"))
    )
    j = li_brand.join(pa, F.col("l_partkey") == F.col("apk")).filter(
        F.col("qty") < 0.2 * (F.col("sq").cast("double") / F.col("cnt"))
    )
    return j.agg(
        F.sum("ext_c").alias("sum_ext_c"),
        (F.sum("ext_c") / 100.0 / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT {_REVENUE_SQL} AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: revenue from three
    disjunctive (brand, size band, quantity band) branches — the
    classic OR-of-ANDs predicate that defeats naive single-range
    pushdown (ship-mode/container filters map to size bands).

    Plan shape: part is a hard broadcast, so the disjunction evaluates
    map-side with zero fact-table shuffle; the part side pre-filters to
    the union of the three brand/size boxes (a superset of the
    disjunction — safe) so the broadcast hash table stays small. The
    aggregate is one global row from map-side partials."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5))
            | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10))
            | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30))
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).filter(cond)
    return j.agg(_revenue().alias("revenue"), F.count("*").alias("n_lines"))


@register(
    "tpch_q20_potential_promotion",
    oracle=f"""
    WITH ps AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum({_QTY}) AS BIGINT) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND EXISTS (
        SELECT 1 FROM ps JOIN part ON p_partkey = l_partkey
        WHERE l_suppkey = s_suppkey
          AND p_name LIKE 'red %'
          AND sq > 60
      )
    """,
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: European suppliers
    who moved a significant volume (> 60 units in 1997) of some 'red'
    part — candidates for a promotion (observed shipped quantity stands
    in for the missing ps_availqty excess test).

    Plan shape: the year filter is pushed to the scan, the 'red' part
    keyset broadcast-semi-prunes lines BEFORE the (suppkey, partkey)
    quantity aggregate, the volume HAVING shrinks that to a handful of
    supplier keys, and the EXISTS is a LEFT SEMI join of the
    (broadcast-pruned) European supplier dim against those keys — the
    fact table is touched once, aggregated once."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    qty = F.round(F.col("l_quantity")).cast("bigint")
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_suppkey", "l_partkey", qty.alias("qty"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("qty").alias("sq"))
        .filter(F.col("sq") > 60)
        .select("l_suppkey")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    return sup.join(ps, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")


@register(
    "tpch_q21_suppliers_who_kept_orders_waiting",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey AS pok,
             count(DISTINCT l_suppkey) AS ns,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nls
      FROM lo GROUP BY l_orderkey
    ), late_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late
    )
    SELECT s_name, count(*) AS numwait
    FROM late_pairs
    JOIN per_order ON pok = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE ns > 1 AND nls = 1 AND r_name = 'EUROPE'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_suppliers_who_kept_orders_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: European
    suppliers who were the SOLE late supplier on finished multi-supplier
    orders ("late" = shipped > 90 days after ordering; the schema has no
    commit/receipt dates, and the nation filter widens to a region —
    the generated data has only ~4 suppliers per nation).

    Plan shape: the official EXISTS / NOT EXISTS pair over sibling
    lines is re-expressed through ONE pair-level pre-aggregate —
    max(late) per (orderkey, suppkey) — from which BOTH downstream
    relations derive: the per-order (ns, nls) counts (plain count +
    conditional sum, no COUNT DISTINCT expand doubling the shuffle)
    and the late-pair list (a filter, not a second distinct pass). A
    supplier qualifies on an order iff it shipped late, ns > 1, and
    nls = 1 — identical semantics to the correlated self-joins, one
    orderkey-hashed shuffle of the fact table total.
    Supplier/nation/region prune by broadcast at the very end, on
    pair-level rows."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    pair = lo.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    per_order = pair.groupBy(F.col("l_orderkey").alias("pok")).agg(
        F.count("*").alias("ns"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("nls"),
    )
    late_pairs = pair.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    q = (
        late_pairs.join(per_order, F.col("pok") == F.col("l_orderkey"))
        .filter((F.col("ns") > 1) & (F.col("nls") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        q.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
