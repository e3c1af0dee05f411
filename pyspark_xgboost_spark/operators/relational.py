"""Relational operator surface over the star schema (SURVEY.md §2.2/§2.3).

Every query here is declarative DataFrame API — Catalyst does predicate
pushdown / column pruning / join selection; AQE handles runtime
coalescing and skew. Each has a DuckDB oracle with identical aliases.

Scale notes (100 TB):
* fact-fact joins shuffle on their keys; dimension joins are explicitly
  ``F.broadcast`` hinted (region/nation/supplier/part/customer stay tiny
  relative to facts at any SF),
* aggregates are partial (map-side combine) automatically for all
  ``groupBy().agg`` used here,
* money aggregates run on exact integer cents (see ``_cents``) so results
  are bit-identical under any summation order — floating-point sums are
  not associative and a 1000-executor sum order differs from a 32-thread
  one; note Spark's ROUND (decimal-string HALF_UP) also disagrees with
  DuckDB's (binary) exactly on the terminating decimals integer division
  produces, so deterministic columns are emitted UNROUNDED.

Reference parity: the reference composes only projection/alias
(xgboost_core.py:437-467), cast (:375), repartition (:376), and a global
countDistinct (:328-337); everything else below is the §2.3 extension
surface mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col) -> F.Column:
    """Money column (2-decimal double) → exact integer cents.

    Floating-point sums are not associative: a 1000-executor Spark sum and
    DuckDB's sequential sum land on different ulps, so ROUND(sum(double))
    at any precision is flaky at the rounding boundary. Summing exact
    int64 cents is order-independent and deterministic at every scale.
    (Headroom: int64 overflows around 9.2e18 — at 100 TB use DECIMAL(38,4);
    cents here keep the oracle bit-exact.)
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col * 100, 0).cast("bigint")


# --------------------------------------------------------------------------
# Scans / projections / filters
# --------------------------------------------------------------------------


@register(
    "scan_parquet",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(max(l_orderkey) AS BIGINT) AS max_orderkey,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + global agg. Catalyst prunes to 2 columns
    (check ReadSchema in explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "project_alias",
    oracle="""
    SELECT l_orderkey AS order_id,
           l_linenumber AS line_no,
           l_extendedprice AS price,
           l_quantity AS qty
    FROM lineitem
    """,
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: narrow projection + rename (reference xgboost_core.py:437-467).
    Column pruning reaches the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
    )


@register(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 25.0
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates — all pushed to the parquet scan
    (PushedFilters in explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 25.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@register(
    "agg_group",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT))
                          * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) / 1000000.0 AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_price,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: hash agg with map-side partial agg.

    Money math runs on exact integer cents (see _cents) so the result is
    identical under any summation order — 32 threads or 1000 executors.
    """
    li = _t(spark, sf_dir, "lineitem")
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    tax_c = _cents("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)) / 10000.0).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_c) * (100 + tax_c)) / 1000000.0).alias(
                "sum_charge"
            ),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (F.sum(price_c) / 100.0 / F.count("*")).alias("avg_price"),
            (F.sum(disc_c) / 100.0 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "distinct_count_agg",
    oracle="""
    SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_classes,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs
    FROM embeddings
    """,
)
def distinct_count_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: exact global countDistinct (reference xgboost_core.py:328-337
    uses it to infer num_class). At 100 TB prefer approx_count_distinct
    (see ml_queries.approx_distinct) unless exactness is required."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.agg(
        F.countDistinct("label").alias("n_classes"),
        F.countDistinct("vec_id").alias("n_vecs"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations via CUBE."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.sum(_cents("o_totalprice")) / 100.0).alias("sum_price"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_value,
           ROUND(stddev_samp(value), 4) AS std_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(_cents("value")) / 100.0 / F.count("*")).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("std_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "join_hash_inner",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_hash_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst/AQE picks broadcast vs sort-merge by
    size. At 100 TB customer is still << lineitem, so broadcast wins."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("revenue"),
        )
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of the fact against a dimension —
    no shuffle of the 100 TB fact side.

    Precondition for the hint: `part` must fit in executor + driver
    memory (it scales ~0.2 GB/SF uncompressed, so the hint is sound to
    roughly SF 1000; this query is the NAMED demonstration of the
    hinted form). Past that size, drop the hint and let AQE's runtime
    size check decide — see join_multiway for the AQE-delegated form
    on a dimension that scales past broadcast range."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))) / 10000.0
            ).alias("revenue"),
        )
    )


@register(
    "join_semi_anti",
    oracle="""
    SELECT 'with_orders' AS kind, count(*) AS n
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS kind, count(*) AS n
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) and left_anti (NOT EXISTS) joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(o, "c_custkey", "left_semi").agg(F.count("*").alias("n")).select(
        F.lit("with_orders").alias("kind"), "n"
    )
    anti = c.join(o, "c_custkey", "left_anti").agg(F.count("*").alias("n")).select(
        F.lit("without_orders").alias("kind"), "n"
    )
    return semi.unionAll(anti)


@register(
    "join_outer",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           COALESCE(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT), 0) / 100.0 AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)) / 100.0
            ).alias("total_spent"),
        )
    )


@register(
    "join_multiway",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ customer ⋈ 2 broadcast dims; Catalyst
    reorders/folds, the region filter prunes before the fact join.

    Broadcast hints go ONLY on the genuinely constant-size dims
    (nation=25 rows, region=5 rows at every SF). ``customer`` SCALES
    with SF (~15 B rows at the 100 TB design point), so it carries no
    hint: AQE's runtime size check picks broadcast at bench SF (plan
    asserted by test_multiway_customer_join_strategy) and falls back
    to a shuffle join when customer outgrows the threshold — a forced
    hint would override that check and OOM the executors at scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — classic top-k-per-group via
    row_number; unique o_orderkey breaks price ties deterministically."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_frame_agg",
    oracle="""
    SELECT event_id, user_id,
           sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS event_seq
    FROM events
    """,
)
def window_frame_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an explicit ROWS frame per user."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum("value").over(w).alias("running_value"),
        F.count("*").over(w).alias("event_seq"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           value - COALESCE(lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS delta_prev,
           COALESCE(lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 'NONE') AS next_type
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation within per-user event streams."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias(
            "delta_prev"
        ),
        F.coalesce(F.lead("event_type").over(w), F.lit("NONE")).alias("next_type"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops
# --------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge, no full sort/shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
    )


@register(
    "setop_union_except",
    oracle="""
    SELECT nk FROM (
      SELECT CAST(c_nationkey AS INTEGER) AS nk FROM customer
      UNION
      SELECT CAST(s_nationkey AS INTEGER) AS nk FROM supplier
    )
    EXCEPT
    SELECT CAST(n_nationkey AS INTEGER) AS nk FROM nation WHERE n_regionkey = 0
    """,
)
def setop_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) then EXCEPT."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nk"))
    n0 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").cast("int").alias("nk"))
    )
    return c.union(s).distinct().exceptAll(n0).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT CAST(c_nationkey AS INTEGER) AS nk FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS INTEGER) AS nk FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT distinct."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nk"))
    return c.intersect(s)


# --------------------------------------------------------------------------
# Scalar functions
# --------------------------------------------------------------------------


@register(
    "scalar_string_date_math",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 8)) AS prio_upper,
           CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
           ROUND(sqrt(o_totalprice), 4) AS sqrt_price,
           ROUND(ln(o_totalprice + 1), 4) AS ln_price,
           ROUND(abs(o_totalprice - 100000.0), 4) AS abs_diff,
           CAST(trunc(o_totalprice) AS BIGINT) % 97 AS price_mod
    FROM orders
    """,
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar functions — all JVM-side codegen'd
    F.* builtins, no Python in the row path."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_upper"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("o_totalprice") + 1), 4).alias("ln_price"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 4).alias("abs_diff"),
        (F.col("o_totalprice").cast("bigint") % 97).alias("price_mod"),
    )


@register(
    "train_val_split",
    oracle="""
    SELECT CASE WHEN l_orderkey % 10 < 8 THEN 'train' ELSE 'val' END AS split,
           count(*) AS n,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 lifted to Spark: deterministic key-hash train/val split as a
    filterable column (reference does it pandas-side, data.py:158-160)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "split",
            F.when(F.col("l_orderkey") % 10 < 8, F.lit("train")).otherwise(F.lit("val")),
        )
        .groupBy("split")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-flag,
    per-status, and grand-total rows in ONE pass — Spark expands the
    sets with a single Expand node over one scan instead of 3 unioned
    aggregations."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery — Catalyst decorrelates it into a left
    semi join (SURVEY §4: subquery decorrelation is free), so the plan
    is a semi-join on o_custkey with the price filter pushed below it,
    not a per-row probe."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer_sq c
        WHERE EXISTS (
          SELECT 1 FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_F,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_O,
           CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F,
           CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): one row per returnflag, one column pair
    per linestatus. Explicit pivot values keep it single-pass — without
    them Spark runs an extra distinct job to discover the columns."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_F"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_O"),
        F.col("F_qty").cast("double").alias("qty_F"),
        F.col("O_qty").cast("double").alias("qty_O"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS od_us,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(epoch_us(o_orderdate) AS BIGINT)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ) AS n_last_7d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per customer,
    how many orders landed in the trailing 7 days — the rolling-feature
    shape every training pipeline computes. RANGE frames need a single
    numeric sort key, so the date goes through epoch micros."""
    o = _t(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; session tz is UTC so the cast is
    # a reinterpretation, matching DuckDB epoch_us on the naive value
    od_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(od_us)
        .rangeBetween(-604800000000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        od_us.alias("od_us"),
        F.count("*").over(w).alias("n_last_7d"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (top-3 priciest orders per priority) — the
    grouped variant of sort_limit_topk. The window + filter shape keeps
    it one shuffle on the group key with per-partition heaps; a global
    orderBy-then-filter would instead range-shuffle the whole fact
    table. Tie-broken on o_orderkey so row_number is deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "join_theta_nlj",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey <> r.r_regionkey
    """,
)
def join_theta_nlj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi, no equality conjunct) join: each nation
    paired with every region it is NOT in. No hash key exists, so the
    only physical strategy is a nested-loop join — Catalyst picks
    BroadcastNestedLoopJoin with the 5-row region side broadcast, which
    is exactly right at any fact scale: NLJ is O(n·m) and survives only
    when one side is tiny."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(
        F.broadcast(r), F.col("n_regionkey") != F.col("r_regionkey")
    ).select("n_name", "r_name")


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing + rank
    normalization per market segment. percent_rank = (rank-1)/(n-1) is
    the same IEEE division in both engines, so values hash-match
    exactly; the sort key includes c_custkey to make ties
    deterministic."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           floor(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) * 100) / 100 AS p25,
           floor(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE) * 100) / 100 AS p50,
           floor(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) * 100) / 100 AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles via Spark's percentile aggregate
    (single pass, one shuffle on the group key; the 100 TB-scale
    variant is percentile_approx's KLL-style sketch, mergeable on
    map side). Floored to 2dp to absorb last-ulp interpolation
    differences vs DuckDB's quantile_cont."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
    agg = li.groupBy("l_returnflag").agg(pct.alias("ps"))
    def fl(i: int):
        return F.floor(F.element_at("ps", i) * 100) / 100
    return agg.select(
        "l_returnflag",
        fl(1).alias("p25"),
        fl(2).alias("p50"),
        fl(3).alias("p75"),
    )


@register(
    "scalar_map_ops",
    oracle="""
    SELECT n_nationkey, u.key AS k, u.value AS v
    FROM (
      SELECT n_nationkey,
             unnest(map_entries(MAP {
               'name': n_name,
               'region': CAST(n_regionkey AS VARCHAR)
             })) AS u
      FROM nation
    )
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar functions: build a map<string,string> per row
    (create_map), then lateral-explode it to (key, value) rows — the
    schema-flexible attribute-bag shape. explode is a narrow op (no
    shuffle); map columns stay columnar in Tungsten rows."""
    n = _t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select("n_nationkey", F.explode(m).alias("k", "v"))


@register(
    "scalar_try_cast",
    oracle="""
    SELECT props,
           TRY_CAST(json_extract_string(props, '$.plan') AS INTEGER) AS plan_int,
           COALESCE(TRY_CAST(json_extract_string(props, '$.score') AS DOUBLE), -1.0)
             AS score_or_default,
           CASE WHEN CAST(json_extract_string(props, '$.retries') AS DOUBLE) = 0
                THEN NULL
                ELSE CAST(json_extract_string(props, '$.clicks') AS DOUBLE)
                     / CAST(json_extract_string(props, '$.retries') AS DOUBLE)
           END AS clicks_per_retry
    FROM events
    WHERE event_id < 100
    """,
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar evaluation over dirty semi-structured data:
    try_cast returns NULL instead of failing the 100 TB job on one
    malformed record (ANSI mode makes plain CAST throw), and try_divide
    nulls out division by zero. The dirty-data operators every landing-
    zone pipeline needs before types are trusted."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    plan_s = F.get_json_object("props", "$.plan")
    score_s = F.get_json_object("props", "$.score")
    clicks_s = F.get_json_object("props", "$.clicks")
    retries_s = F.get_json_object("props", "$.retries")
    return ev.select(
        "props",
        plan_s.try_cast("int").alias("plan_int"),
        F.coalesce(score_s.try_cast("double"), F.lit(-1.0)).alias(
            "score_or_default"
        ),
        F.try_divide(clicks_s.cast("double"), retries_s.cast("double")).alias(
            "clicks_per_retry"
        ),
    )


@register(
    "agg_distinct_group",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group DISTINCT aggregation (two distinct columns + a plain
    count in one pass). Catalyst rewrites multi-distinct into an Expand
    (one row replica per distinct set) + two-phase aggregation — a
    fundamentally different physical shape from the global
    distinct_count_agg; at 100 TB swap to approx_count_distinct unless
    exactness is contractual (the Expand multiplies shuffle volume by
    the number of distinct specs)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "unpivot_melt",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS sum_base_price,
             CAST(count(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value
    FROM agg UNPIVOT (value FOR measure IN (sum_qty, sum_base_price, n_items))
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): aggregate per return flag into three
    measure columns, then unpivot them to (measure, value) rows — the
    inverse of agg_pivot and the standard feed for long-format plotting
    / metric stores. Spark's native ``DataFrame.unpivot`` lowers to a
    single Expand node (each input row replicated once per measure,
    map-side, no shuffle, no UDF); the oracle uses DuckDB's UNPIVOT.
    Reshaping AFTER aggregation means Expand runs on 3 rows, not the
    fact table — at 100 TB melt-then-aggregate would triple scan+shuffle
    volume for identical output. Quantities sum exactly in doubles
    (integral values < 2^53); money goes through integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        (F.sum(_cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_base_price", "n_items"], "measure", "value"
    )


@register(
    "agg_mode_exact",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority
             ) AS rk
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ) ranked
    WHERE rk = 1
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact statistical MODE per group with a DETERMINISTIC tie-break
    (most frequent o_orderpriority per order status; ties go to the
    lexicographically smallest value). Engines' built-in mode()
    functions break ties arbitrarily — the count + rank formulation is
    the only portable, partition-stable way to pin the answer, and the
    reason this registers as its own operator rather than `mode()`.

    Scale shape: the heavy lifting is ONE map-side-combined groupBy
    over (group, value) — at 100 TB the shuffle moves only partial
    counts for the distinct (status, priority) combinations (15 here,
    bounded by the value domain, not row count). The rank window runs
    over that already-tiny aggregate."""
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@register(
    "scalar_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           CAST(list_sum(list_transform(milli, x -> x * x)) AS BIGINT)
             AS sumsq_milli2,
           CAST(list_max(milli) AS BIGINT) AS max_milli,
           CAST(list_dot_product(CAST(milli AS DOUBLE[]),
                                 CAST(list_reverse(milli) AS DOUBLE[]))
                AS BIGINT) AS dot_rev_milli2
    FROM (
      SELECT vec_id, embedding,
             list_transform(embedding,
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS milli
      FROM embeddings
    ) m
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order ARRAY functions over the embedding column — the
    JVM-side vector toolkit (transform / aggregate / zip_with / reverse
    / array_max) that keeps per-vector math out of Python entirely.
    Components quantize to integer thousandths first, so the fold sums
    (self-dot, reversed-dot) are exact BIGINTs on both engines — the
    same discipline as every money aggregate. The reversed-self dot
    exercises zip_with's pairwise lane explicitly (DuckDB mirrors it
    with list_dot_product over the reversed list; products of
    integer-valued doubles ≤ 2^53 are exact, so the cast back to
    BIGINT is lossless).

    Scale shape: pure map-side projection — no shuffle, no UDF; at
    100 TB this is a scan whose cost is the arithmetic itself."""
    emb = load_table(spark, sf_dir, "embeddings")
    # floor, NOT round: float32-promoted doubles routinely land within
    # a ulp of a .5 boundary, where Spark's decimal-string HALF_UP and
    # DuckDB's binary half-away-from-zero disagree (one embedding
    # component did exactly that at sf0.1); floor of the identical
    # binary double is engine-invariant — the same quantizer every
    # other embedding operator uses
    milli = F.transform(
        F.col("embedding"), lambda x: F.floor(x * 1000).cast("bigint")
    )
    m = emb.select("vec_id", milli.alias("milli"))
    sumsq = F.aggregate(
        F.transform(F.col("milli"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    dot_rev = F.aggregate(
        F.zip_with(F.col("milli"), F.reverse(F.col("milli")), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return m.select(
        "vec_id",
        F.size("milli").alias("n_dims"),
        sumsq.alias("sumsq_milli2"),
        F.array_max("milli").alias("max_milli"),
        dot_rev.alias("dot_rev_milli2"),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH fact AS (
      SELECT NULLIF(o_orderstatus, 'P') AS k, o_orderkey FROM orders
    ),
    dim AS (
      SELECT DISTINCT NULLIF(o_orderstatus, 'P') AS dk, o_orderstatus AS name
      FROM orders
    )
    SELECT dim.name, count(*) AS n
    FROM fact JOIN dim ON fact.k IS NOT DISTINCT FROM dim.dk
    GROUP BY dim.name
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantic corner
    that loses rows in every naive "join on a nullable column" pipeline
    (a plain equi join treats NULL = NULL as unknown and discards the
    pair). Here the 'P' status is NULLed on both sides and still joins.

    Scale shape: eqNullSafe is a first-class equi-join key for Spark —
    it hashes NULL like any value, so the join stays a hash/broadcast
    join (NOT a nested loop); the dim side broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k"), "o_orderkey"
    )
    dim = orders.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("dk"),
        F.col("o_orderstatus").alias("name"),
    ).distinct()
    j = fact.join(F.broadcast(dim), F.col("k").eqNullSafe(F.col("dk")))
    return j.groupBy("name").agg(F.count("*").alias("n"))


@register(
    "setop_except_intersect_all",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
         ea AS (SELECT p FROM a EXCEPT ALL SELECT p FROM b),
         ia AS (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
    SELECT 'except_all' AS op, p, count(*) AS n FROM ea GROUP BY p
    UNION ALL
    SELECT 'intersect_all' AS op, p, count(*) AS n FROM ia GROUP BY p
    """,
)
def setop_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations (EXCEPT ALL / INTERSECT ALL): bag
    semantics keep duplicate multiplicity — |A∖B| per value is
    max(0, cnt_A − cnt_B) and |A∩B| is min(cnt_A, cnt_B) — where the
    DISTINCT forms (setop_union_except / setop_intersect) collapse to
    membership. The per-value counts are the assertion of exactly that
    arithmetic.

    Scale shape: Spark rewrites both into aggregate+generate over
    per-value counts — one shuffle on the value, never a sort of
    either input relation."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("p")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("p")
    )
    ea = a.exceptAll(b).groupBy("p").agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "p", "n"
    )
    ia = a.intersectAll(b).groupBy("p").agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "p", "n"
    )
    return ea.union(ia)


@register(
    "agg_count_if_bool",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_totalprice > 1000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_count_if_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern conditional/boolean aggregates: count_if + bool_and /
    bool_or (ANSI every/any) — the declarative forms of the
    sum(CASE...) idiom, all associative and commutative so partial
    aggregation is exact at any partition count.

    Scale shape: map-side combine into |status| groups; booleans
    reduce to single bits per group before the KB-sized exchange."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("count_if(o_totalprice > 1000)").alias("n_big"),
        F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
        F.expr("bool_or(o_orderpriority = '1-URGENT')").alias("any_urgent"),
    )


@register(
    "sql_recursive_date_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01'
    ),
    rev AS (
      SELECT date_trunc('month', o_orderdate) AS mm,
             count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    )
    SELECT CAST(epoch_us(m) AS BIGINT) AS month_us,
           COALESCE(n, 0) AS n_orders,
           COALESCE(cents, 0) AS revenue_cents
    FROM months LEFT JOIN rev ON mm = m
    """,
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE in Spark SQL (new in Spark 4.x): generate the
    monthly calendar spine recursively — the SQL-standard date-spine
    idiom — and left-join monthly order revenue onto it so zero-order
    months surface explicitly (the complement to
    events_resample_gapfill's sequence()-based spine: same contract,
    declarative ANSI form, portable verbatim to the DuckDB oracle).
    The recursion is depth-bounded by the date range (80 months), the
    only shape Spark's recursion supports today (UNION ALL anchor +
    step; UNION-dedup recursion — and with it unbounded graph closure
    — is not available, which is why dedup_groups_connected keeps its
    iterative min-label loop).

    Scale note: each recursive step is one tiny batch (the spine is
    calendar-sized, not data-sized); the revenue side is one map-side-
    combined aggregate joined once. The spine side of the LEFT join is
    ~80 rows — broadcast — so the monthly rollup never shuffles twice."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "spine_orders_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01'
        ),
        rev AS (
          SELECT date_trunc('month', o_orderdate) AS mm,
                 count(*) AS n,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
          FROM spine_orders_v GROUP BY 1
        )
        SELECT unix_micros(m) AS month_us,
               COALESCE(n, CAST(0 AS BIGINT)) AS n_orders,
               COALESCE(cents, CAST(0 AS BIGINT)) AS revenue_cents
        FROM months LEFT JOIN rev ON mm = CAST(m AS TIMESTAMP)
        """
    )


@register(
    "agg_corr_regression",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS corr_xy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             AS regr_slope
    FROM s
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + least-squares slope per group, PARTITION-STABLE:
    built-in corr()/regr_slope() accumulate floating moments whose
    partial-merge order varies with partition count (the same
    nondeterminism every float aggregate has), so instead the five
    integer power sums (Σx, Σy, Σx², Σy², Σxy) aggregate EXACTLY
    (quantity and whole-dollar price are integers) and both statistics
    derive from them in one closed-form double expression — identical
    IEEE ops on identical integers on both engines, bit-stable at any
    partition count (the invariance sweep proves it; built-in corr
    would fail it). The raw sums are output too, so the oracle pins
    the exact integers, not just the derived doubles.

    Scale shape: one map-side-combined scan into |returnflag| groups;
    the sums stay in BIGINT range through SF~10 with whole-dollar
    quantization (cents-squared would overflow at sf0.1 — the
    quantization unit is a scale decision, documented here)."""
    x = F.round(F.col("l_quantity")).cast("bigint")
    y = F.round(F.col("l_extendedprice")).cast("bigint")
    q = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", x.alias("x"), y.alias("y")
    )
    s = q.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        "l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy",
        (cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_xy"),
        (cov_n / var_x).alias("regr_slope"),
    )


@register(
    "agg_weighted_percentile",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    collapsed AS (
      SELECT rf, price_cents, sum(qty) AS qty
      FROM w GROUP BY rf, price_cents
    ),
    c AS (
      SELECT rf, price_cents,
             sum(qty) OVER (PARTITION BY rf ORDER BY price_cents
                            ROWS UNBOUNDED PRECEDING) AS cw,
             sum(qty) OVER (PARTITION BY rf) AS tw
      FROM collapsed
    )
    SELECT rf AS l_returnflag,
           CAST(min(tw) AS BIGINT) AS total_weight,
           min(CASE WHEN cw * 2 >= tw THEN price_cents END) AS p50_cents,
           min(CASE WHEN cw * 10 >= tw * 9 THEN price_cents END) AS p90_cents
    FROM c GROUP BY rf
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED percentiles (median and p90 of price, weighted by
    quantity, per return flag) — the quantile family percentile_approx
    and exact percentile don't cover: each observation counts with its
    weight, the estimator every revenue/exposure-weighted SLA needs.
    Semantics: smallest value whose cumulative weight reaches q·W
    (left-continuous weighted quantile), stated in exact integers
    (cw·2 ≥ tw avoids any float q·W), so both engines agree to the
    cent.

    Scale shape: duplicate values COLLAPSE in a map-side-combinable
    groupBy before any window runs, so the cumulative-weight window
    sorts distinct (group, value) pairs, not raw rows — at 100 TB the
    window input is bounded by value cardinality per group. Both
    windows and the final aggregate share one hash exchange on the
    group key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    collapsed = li.groupBy("rf", "price_cents").agg(F.sum("qty").alias("qty"))
    cum = (
        W.partitionBy("rf")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = W.partitionBy("rf")
    c = collapsed.select(
        "rf",
        "price_cents",
        F.sum("qty").over(cum).alias("cw"),
        F.sum("qty").over(tot).alias("tw"),
    )
    return c.groupBy(F.col("rf").alias("l_returnflag")).agg(
        F.min("tw").cast("bigint").alias("total_weight"),
        F.min(
            F.when(F.col("cw") * 2 >= F.col("tw"), F.col("price_cents"))
        ).alias("p50_cents"),
        F.min(
            F.when(F.col("cw") * 10 >= F.col("tw") * 9, F.col("price_cents"))
        ).alias("p90_cents"),
    )


@register(
    "join_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal_cents
    FROM nation n, LATERAL (
      SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's DataFrame.lateralJoin — the correlated-subquery-per-row
    API (SQL LATERAL): for each nation, its top-2 customers by account
    balance. Registered alongside topk_per_group (the window
    formulation of the same shape) so BOTH idioms are oracle-pinned;
    the lateral form is what users port verbatim from
    LATERAL/CROSS-APPLY warehouse SQL.

    Catalyst decorrelates the per-row subquery (limit → per-group
    rank) rather than executing it row-at-a-time, so the plan is a
    join + ranking over one exchange, not N subquery executions —
    verify with explain(); ties break on custkey for cross-engine
    determinism, money in exact cents."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    sub = (
        cust.where(F.col("n_nationkey").outer() == F.col("c_nationkey"))
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(2)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100, 0)
            .cast("bigint")
            .alias("c_acctbal_cents"),
        )
    )
    return nation.lateralJoin(sub).select("n_name", "c_custkey", "c_acctbal_cents")


@register(
    "agg_histogram_fixed_bins",
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 50), 9) AS BIGINT) AS bin,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (10 bins of width 50,
    top bin open) — the single-pass data-profiling aggregate behind
    distribution dashboards and drift monitors. Binning is arithmetic
    (floor(v/50) clamped), so it map-side-combines into
    O(types × bins) groups — the shuffle is KB-sized at any input
    scale, the same property the equal-frequency bucketer's histogram
    path relies on; both engines compute the identical IEEE division
    and floor."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("bigint")
    return ev.groupBy("event_type", bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("sum_cents"),
    )


_SKEW_BUCKETS = 64


@register(
    "audit_partition_skew",
    oracle=f"""
    WITH h AS (
      SELECT CAST((strpos('0123456789abcdef',
                          substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef',
                           substr(md5(CAST(o_custkey AS VARCHAR)), 2, 1)) - 1
                  AS BIGINT) % {_SKEW_BUCKETS} AS bucket
      FROM orders
    ),
    per AS (SELECT bucket, count(*) AS n FROM h GROUP BY bucket)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(n) AS BIGINT) AS min_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(max(n) * {_SKEW_BUCKETS} AS BIGINT) AS skew_num,
           CAST(sum(n) AS BIGINT) AS skew_den
    FROM per
    """,
)
def audit_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SKEW AUDIT — the diagnostic you run BEFORE picking a
    join/agg strategy at scale: hash the candidate shuffle key into
    {_SKEW_BUCKETS} buckets (two md5 hex digits — engine-portable,
    exactly how rows would distribute across reducers) and report the
    distribution. skew_num/skew_den is the max-over-mean hot-spot
    factor: ~1 means salting is wasted effort, >>1 means the hottest
    reducer stalls the stage and you reach for salting
    (join_skew_salted) or AQE skew splitting (join_skew_aqe_stress) —
    this query is the measurement step of that decision.

    Scale shape: one map-side-combined groupBy into {_SKEW_BUCKETS}
    partials — KB-sized shuffle at any input size; integer
    numerator/denominator keep the factor engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    hex1 = F.expr(
        "conv(substr(md5(cast(o_custkey as string)), 1, 2), 16, 10)"
    ).cast("bigint")
    per = orders.select((hex1 % _SKEW_BUCKETS).alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count("*").alias("n"))
    return per.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.min("n").cast("bigint").alias("min_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.sum("n").cast("bigint").alias("total_rows"),
        (F.max("n") * _SKEW_BUCKETS).cast("bigint").alias("skew_num"),
        F.sum("n").cast("bigint").alias("skew_den"),
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    SELECT rn,
           o_orderkey,
           ship_date
    FROM (
      SELECT row_number() OVER (
               ORDER BY ship_date ASC NULLS FIRST,
                        total_cents DESC NULLS LAST,
                        o_orderkey ASC
             ) AS rn,
             o_orderkey, ship_date
      FROM (
        SELECT o.o_orderkey,
               CASE WHEN o.o_orderkey % 13 = 0 THEN NULL
                    ELSE min(l.l_shipdate) END AS ship_date,
               CASE WHEN o.o_orderkey % 17 = 0 THEN NULL
                    ELSE CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                         AS BIGINT) END AS total_cents
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey
      )
    )
    WHERE rn <= 50
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT NULL-ordering sort — the silent migration breaker: with
    a bare ORDER BY, Spark puts NULLs FIRST ascending while most
    warehouses (DuckDB, Postgres, Snowflake) put them LAST, so any
    ported top-k over nullable keys returns different rows unless the
    ordering is spelled out. This contract pins a mixed three-key sort
    (ASC NULLS FIRST, DESC NULLS LAST, then a unique tiebreaker) with
    NULLs injected deterministically into both sort keys; the rank
    prefix hash-matches only if both engines agree on every NULL
    placement.

    Scale shape: the rank prefix is a TakeOrderedAndProject-style
    bounded selection over the aggregated (order-level) relation —
    the full sort never materializes."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    agg = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.when(F.col("o_orderkey") % 13 == 0, F.lit(None)).otherwise(
                F.min("l_shipdate")
            ).alias("ship_date"),
            F.when(F.col("o_orderkey") % 17 == 0, F.lit(None)).otherwise(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            ).cast("bigint").alias("total_cents"),
        )
    )
    w = W.orderBy(
        F.col("ship_date").asc_nulls_first(),
        F.col("total_cents").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("rn", "o_orderkey", "ship_date")
    )


@register(
    "scalar_url_extract",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang ||
             '/' || CAST(doc_id AS VARCHAR) || '?ref=crawl&sz=' ||
             CAST(n_chars AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'sz=([0-9]+)', 1) AS sz_param
    FROM u
    """,
)
def scalar_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — host / path / query-parameter extraction, the
    first step of URL-keyed web-crawl curation (per-domain quotas,
    path-pattern filters, tracking-param stripping). URLs are
    constructed deterministically from document fields, then PARSED
    with Spark's native parse_url (HOST / PATH / QUERY:key forms —
    JVM-side, no regex engine involved) while the oracle states the
    same extraction as anchored RE2 regexes — so the query also pins
    that parse_url's component semantics match the portable
    regex-based definition. Pure map-side, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=crawl&sz="),
        F.col("n_chars").cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("sz")).alias("sz_param"),
    )


@register(
    "agg_string_concat_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           count(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED string aggregation (LISTAGG / string_agg ... ORDER BY) —
    the report-building aggregate every warehouse query uses and every
    engine implements with different ordering defaults: without an
    explicit order the concatenation is partition-order-dependent and
    can never hash-match (or be diffed between runs). Expressed as
    sort-then-join over the collected set, which is the
    deterministic-by-construction form; Spark 4's native listagg is
    the same surface and inherits the ordering requirement.

    Scale shape: map-side partial collect into small per-group lists
    (group cardinality bounds the state — this is a DIMENSION
    aggregate; concatenating a billion-row group into one string is an
    anti-pattern regardless of engine)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
        F.count("*").alias("n_nations"),
    )


@register(
    "agg_map_group_counts",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    )
    SELECT source,
           string_agg(lang || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY lang) AS lang_counts,
           count(*) AS n_langs
    FROM c GROUP BY source
    """,
)
def agg_map_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-valued aggregation — per-source lang→count maps, the shape
    feature stores and profiling jobs emit (one row per entity, a map
    of per-category stats) instead of exploding categories into rows.
    Built as map_from_entries over the key-sorted entry list; for the
    cross-engine hash the map serializes to its canonical
    'k:v,...' entry string (maps have no portable comparison — the
    canonical serialization IS the contract, and it is exactly what a
    JSON/parquet sink would persist).

    Scale shape: the inner (source, lang) aggregate map-side-combines
    to dimension size; the map assembly touches only that aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    entries = F.array_sort(
        F.collect_list(F.struct(F.col("lang"), F.col("n")))
    )
    m = F.map_from_entries(entries)
    return c.groupBy("source").agg(
        F.array_join(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
            ),
            ",",
        ).alias("lang_counts"),
        F.count("*").alias("n_langs"),
    )


@register(
    "scalar_calendar_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS next_quarter,
           last_day(o_orderdate) AS month_end,
           CAST(date_part('day', last_day(o_orderdate)) AS BIGINT)
             AS days_in_month,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday
    FROM orders
    """,
)
def scalar_calendar_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR arithmetic contract — the billing/cohort date math
    whose corners differ across engines unless pinned: month addition
    CLAMPS at month end (Jan 31 + 1 month = Feb 29 in a leap year, and
    the clamp is sticky: +13 months lands on Feb 28), last_day /
    days-in-month, ISO week start (Monday), and weekday numbering —
    where the engines genuinely disagree by default (Spark dayofweek
    is 1=Sunday, DuckDB dayofweek is 0=Sunday), so the contract uses
    the ISO form (1=Monday) both engines express: Spark weekday()+1 ==
    DuckDB isodow(). Every billing-cycle query ported between engines
    crosses at least one of these corners.

    Scale shape: pure map-side expression work on the date column,
    zero shuffles, scan pruned to (o_orderkey, o_orderdate)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.add_months(d, 1).alias("next_month"),
        F.add_months(d, 3).alias("next_quarter"),
        F.last_day(d).alias("month_end"),
        F.dayofmonth(F.last_day(d)).cast("bigint").alias("days_in_month"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_weekday"),
    )


@register(
    "agg_collated_group",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN upper(substr(text, 1, 6))
                  ELSE lower(substr(text, 1, 6)) END AS k
      FROM documents
    )
    SELECT lower(k) AS key_ci,
           count(*) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM w
    GROUP BY lower(k)
    """,
)
def agg_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-aware grouping (Spark 4 collations): a
    deterministically case-mangled key (even docs upper-cased, odd
    lower-cased) groups under UTF8_LCASE collation — the engine-level
    case-insensitive equality that replaces sprinkling lower() through
    every predicate, join, and GROUP BY once a column is DECLARED
    case-insensitive. The oracle states the same grouping with
    explicit lower(), pinning that collated grouping is exactly
    lower()-grouping for this data; the output key is normalized to
    lower for the cross-engine hash (each engine may surface any
    representative's case).

    Scale shape: identical to any hash aggregate — the collation
    participates in the hash/compare, so map-side combine and one
    exchange apply unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.when(
        F.col("doc_id") % 2 == 0, F.upper(F.substring("text", 1, 6))
    ).otherwise(F.lower(F.substring("text", 1, 6)))
    w = docs.select("doc_id", k.alias("k")).select(
        "doc_id", F.expr("collate(k, 'UTF8_LCASE')").alias("kc")
    )
    return (
        w.groupBy("kc")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .select(
            F.lower(F.col("kc").cast("string")).alias("key_ci"),
            "n",
            "min_doc",
        )
    )


@register(
    "agg_listagg_native",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name DESC) AS nations_desc,
           count(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_listagg_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0's SQL-standard ``listagg(...) WITHIN GROUP (ORDER BY
    ...)`` — the native form of the ordered string aggregate that
    agg_string_concat_ordered builds from sort+join primitives; both
    registrations keep the two implementations pinned to the same
    semantics (here with a DESCENDING order to also pin the direction
    handling). Same dimension-aggregate scale caveat: group
    cardinality bounds the concatenation state."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.expr(
                "listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name DESC)"
            ).alias("nations_desc"),
            F.count("*").alias("n_nations"),
        )
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_linenumber - 1) = 0 THEN NULL
                ELSE CAST(round(l_extendedprice * 100) AS BIGINT)
                     // (l_linenumber - 1) END AS price_per_prev_line,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)
                END AS unit_price_cents
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: ``try_divide`` yields NULL on /0 instead
    of failing the 3-hour job at row 10^11 (under ANSI mode plain `/`
    RAISES; the try_* family is how a 100 TB pipeline encodes 'null,
    don't die'). Exercised against a denominator that is genuinely
    zero for every first line item. The oracle states the same
    semantics as explicit CASE guards. Integer division via try_divide
    + floor keeps the cross-engine div contract on non-negative
    operands; money division floors to cents (floor of the same IEEE
    quotient is engine-exact; round-half would disagree at .5
    boundaries)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(
                F.try_divide(cents, F.col("l_linenumber") - 1)
            ).cast("bigint").alias("price_per_prev_line"),
            F.floor(
                F.try_divide(F.col("l_extendedprice") * 100, F.col("l_quantity"))
            ).cast("bigint").alias("unit_price_cents"),
        )
    )



# --------------------------------------------------------------------------
# Integer-division portability contract
# --------------------------------------------------------------------------


@register(
    "scalar_intdiv_contract",
    oracle="""
    WITH v AS (
      SELECT l_orderkey,
             CAST(l_orderkey AS BIGINT) - 15000 AS x,
             CAST(l_linenumber AS BIGINT) + 2 AS d
      FROM lineitem WHERE l_orderkey % 97 = 0
    )
    SELECT l_orderkey, x, d,
           CASE WHEN x < 0 THEN -((-x) // d) ELSE x // d END AS quot_trunc,
           CASE WHEN x < 0 THEN -((-x) % d) ELSE x % d END AS rem_trunc
    FROM v
    """,
)
def scalar_intdiv_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The integer-division portability contract, as an attested query:
    Spark's ``div``/``%`` truncate toward zero (C semantics), and so
    does DuckDB 1.0's INTEGER ``//``/``%`` (verified: -7 // 2 = -3) —
    but floor-division dialects exist (Python, MySQL DIV variants,
    DuckDB's float ``//``), so portable code must not bet on either.
    This query forces NEGATIVE numerators and pins Spark's native
    truncating semantics against the oracle's SIGN-RESTORED expression
    (``-((-x) // d)`` for x < 0), which yields trunc under BOTH floor
    and trunc ``//`` semantics — the established cross-engine idiom
    used throughout the dedup/similarity hash pipelines. Any engine or
    version drift in division semantics turns this row red before it
    corrupts a hash-partitioning scheme downstream. Pure map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        (F.col("l_orderkey").cast("bigint") - 15000).alias("x"),
        (F.col("l_linenumber").cast("bigint") + 2).alias("d"),
    )
    return v.select(
        "l_orderkey",
        "x",
        "d",
        F.expr("x div d").alias("quot_trunc"),
        (F.col("x") % F.col("d")).alias("rem_trunc"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit (data-quality / fabrication screening)
# --------------------------------------------------------------------------


@register(
    "audit_benford_first_digit",
    oracle="""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM lineitem WHERE l_extendedprice > 0
    ),
    obs AS (SELECT digit, count(*) AS n_obs FROM c GROUP BY digit),
    tot AS (SELECT count(*) AS n FROM c)
    SELECT obs.digit, CAST(obs.n_obs AS BIGINT) AS n_obs,
           CAST(round((CASE digit WHEN 1 THEN 0.3010299956639812 WHEN 2 THEN 0.17609125905568124 WHEN 3 THEN 0.12493873660829992 WHEN 4 THEN 0.09691001300805642 WHEN 5 THEN 0.07918124604762482 WHEN 6 THEN 0.06694678963061322 WHEN 7 THEN 0.05799194697768673 WHEN 8 THEN 0.05115252244738129 WHEN 9 THEN 0.04575749056067514 END) * tot.n) AS BIGINT) AS n_benford
    FROM obs CROSS JOIN tot
    """,
)
def audit_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over prices — the classic
    fabricated-data / unit-mixup screen (naturally-arising multi-scale
    amounts follow P(d) = log10(1+1/d); a flat or spiked digit
    histogram flags synthetic or corrupted feeds). First digits come
    from EXACT integer cents rendered as strings (no float log10 at a
    power-of-ten boundary); the Benford expectations are the same
    precomputed double literals in both engines. Map-side digit
    extraction + a 9-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    c = li.filter(F.col("l_extendedprice") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    obs = c.groupBy("digit").agg(F.count("*").alias("n_obs"))
    tot = c.agg(F.count("*").alias("n"))
    # build CASE digit WHEN d THEN log10(1+1/d) with the same literals
    expect = None
    for d in range(1, 10):
        p = {1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992, 4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322, 7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514}[d]
        branch = F.when(F.col("digit") == d, F.lit(p))
        expect = branch if expect is None else expect.when(F.col("digit") == d, F.lit(p))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(expect * F.col("n")).cast("bigint").alias("n_benford"),
    )


@register(
    "window_cume_dist_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority, pr, cd
    FROM (
      SELECT o_orderkey, o_orderpriority,
             percent_rank() OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice
             ) AS pr,
             cume_dist() OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice
             ) AS cd
      FROM orders
    )
    WHERE o_orderkey % 997 = 0
    """,
)
def window_cume_dist_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist — the two relative-position window
    functions the window family didn't yet cover (rank/dense_rank/ntile
    are elsewhere). Both are tie-stable: equal sort keys share one
    value, so the result is deterministic under any partition order,
    and both divide exact integers ((rank-1)/(n-1), n_le/n) whose one
    IEEE division agrees engine-exactly. The window computes over the
    FULL partition; the % 997 key sample is applied after, so sampled
    rows carry their true full-data quantile position — the pattern for
    auditing a distribution without shipping every row."""
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .filter(F.col("o_orderkey") % 997 == 0)
        .select("o_orderkey", "o_orderpriority", "pr", "cd")
    )


@register(
    "scalar_bitops_contract",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(l_orderkey & l_suppkey) AS BIGINT) AS sum_and,
           CAST(sum(l_orderkey | l_partkey) AS BIGINT) AS sum_or,
           CAST(sum(xor(l_partkey, l_suppkey)) AS BIGINT) AS sum_xor,
           CAST(sum(l_linenumber << 3) AS BIGINT) AS sum_shl,
           CAST(sum(l_orderkey >> 2) AS BIGINT) AS sum_shr,
           CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS sum_popcnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def scalar_bitops_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family contract: AND / OR / XOR / shifts /
    popcount agree engine-exactly on non-negative BIGINTs (the sign
    bit stays clear, so arithmetic vs logical shift never diverges —
    same 63-bit discipline as the bitmap sketches). Dialect note the
    oracle encodes: DuckDB's ^ is POWER, so portable XOR is xor(a, b)
    there and a ^ b in Spark. All map-side expression work + one
    3-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.expr("l_orderkey & l_suppkey")).alias("sum_and"),
        F.sum(F.expr("l_orderkey | l_partkey")).alias("sum_or"),
        F.sum(F.expr("l_partkey ^ l_suppkey")).alias("sum_xor"),
        F.sum(F.expr("shiftleft(l_linenumber, 3)")).alias("sum_shl"),
        F.sum(F.expr("shiftright(l_orderkey, 2)")).alias("sum_shr"),
        F.sum(F.bit_count("l_orderkey")).alias("sum_popcnt"),
    )


@register(
    "audit_referential_integrity",
    oracle="""
    SELECT 'orders->customer' AS fk_edge,
           (SELECT count(*) FROM orders) AS n_child,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across four FK edges — the DQ gate a
    warehouse runs after every load (an orphan count > 0 means a
    partial load, late dimension, or key corruption). Each edge is one
    left_anti join: dimension-parent edges broadcast the parent key set
    (nation: 25 rows; customer scales but its KEY COLUMN projection is
    what ships); the lineitem->orders edge is the real fact-to-fact
    anti-join, where at 100 TB the scale play is a Bloom/DPP prefilter
    on the child (join_bloom_prefilter shows that form) — here AQE
    picks the strategy from runtime sizes. Counts compose into one
    4-row report."""

    def edge(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        orphans = child.select(F.col(ckey).alias("k")).join(
            parent.select(F.col(pkey).alias("k")), "k", "left_anti"
        )
        return (
            child.agg(F.count("*").alias("n_child"))
            .crossJoin(F.broadcast(orphans.agg(F.count("*").alias("n_orphans"))))
            .select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        edge("orders->customer", orders, "o_custkey", cust, "c_custkey")
        .unionByName(edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"))
        .unionByName(edge("customer->nation", cust, "c_nationkey", nation, "n_nationkey"))
        .unionByName(edge("supplier->nation", supp, "s_nationkey", nation, "n_nationkey"))
    )


_KANON_K = 5  # minimum safe equivalence-class size


@register(
    "audit_k_anonymity",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0)
                  AS BIGINT) AS bal_bucket
      FROM customer
    )
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(CASE WHEN count(*) < {_KANON_K} THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk
    FROM q
    GROUP BY c_nationkey, c_mktsegment, bal_bucket
    """,
)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit (Sweeney 2002) over the quasi-identifier tuple
    (nation, market segment, $1000 balance bucket): every equivalence
    class smaller than k={_KANON_K} is a re-identification risk — a
    published 'anonymized' record in such a class narrows to under
    {_KANON_K} real customers. This is the privacy gate a governed
    data release runs before sharing derived tables; the at_risk rows
    are what generalization (coarser buckets) or suppression must fix.

    Determinism: the balance bucket floors exact integer cents through
    one boundary-exact double division (multiples of 100000 are exact
    doubles), so class membership is bit-stable on both engines —
    including negative balances, where floor (NOT truncate-toward-zero)
    is the agreeing semantics.

    Scale shape: one map-side-combined groupBy over the quasi-identifier
    tuple — shuffle volume is O(classes x partitions), independent of
    row count; the at_risk flag is a projection on the aggregate. At
    100 TB this is the same single-exchange profile as any low-
    cardinality rollup."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    q = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(cents / 100000.0).cast("bigint").alias("bal_bucket"),
    )
    return q.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count("*").cast("bigint").alias("class_size"),
        F.when(F.count("*") < _KANON_K, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("at_risk"),
    )


@register(
    "window_nth_value_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_v,
           first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_v,
           nth_value(v, 2 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_v
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      FROM events
    )
    QUALIFY event_id % 223 = 0
    """,
)
def window_nth_value_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with IGNORE NULLS — the null-skipping
    navigation trio (the remaining window-navigation surface after
    lag/lead/rank elsewhere). last_value IGNORE NULLS over a running
    frame IS last-observation-carried-forward, the canonical sensor/
    price-feed fill; nth_value(2) is 'second reading' lineage. Nulls
    are injected deterministically (view events carry no reading) and
    the ordering key (ts, event_id) is a total order, so every value is
    reproducible. The window computes over full partitions; the key
    sample keeps the attested output compact while each row still
    carries full-partition state."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    full = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.last("v", ignorenulls=True).over(run).alias("locf_v"),
            F.first("v", ignorenulls=True).over(full).alias("first_v"),
            F.nth_value("v", 2, ignoreNulls=True).over(full).alias("second_v"),
        )
        .filter(F.col("event_id") % 223 == 0)
    )


@register(
    "agg_percentile_sketch_contract",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS prio,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
             ) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT prio AS o_orderpriority,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN rk = greatest(1, CAST(floor((0.5 - 0.0002) * n)
                                               AS BIGINT))
                    THEN cents END) AS BIGINT) AS lo50,
           CAST(max(CASE WHEN rk = least(n, CAST(ceil((0.5 + 0.0002) * n)
                                            AS BIGINT))
                    THEN cents END) AS BIGINT) AS hi50,
           TRUE AS within50,
           CAST(max(CASE WHEN rk = greatest(1, CAST(floor((0.9 - 0.0002) * n)
                                               AS BIGINT))
                    THEN cents END) AS BIGINT) AS lo90,
           CAST(max(CASE WHEN rk = least(n, CAST(ceil((0.9 + 0.0002) * n)
                                            AS BIGINT))
                    THEN cents END) AS BIGINT) AS hi90,
           TRUE AS within90
    FROM c
    GROUP BY prio
    """,
)
def agg_percentile_sketch_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE-SKETCH RANK-ERROR CONTRACT: approx_percentile at
    accuracy 10000 carries a Greenwald-Khanna guarantee — the returned
    element's rank is within eps*n of the target, where eps =
    2/accuracy is the bound the merged summary actually maintains (the
    compress/merge invariant is g + delta <= 2*relativeError*n; the
    naive 1/accuracy read of the docs is violated by ~1 rank at sf0.1).
    The query computes the EXACT values at ranks floor((q-eps)n) and
    ceil((q+eps)n) and attests the sketch output lands inside that
    bracket, for p50 and p90 per order priority; the oracle pins the
    exact brackets and expects both attestations TRUE (same two-level
    pattern as agg_approx_distinct_error_bound — the referee checks the
    guarantee, not the sketch bits). At scale the sketch is one
    O(1/eps)-state mergeable aggregate where the exact bracket needs a
    full per-group sort — the attested bound is what licenses shipping
    the sketch."""
    # 2/accuracy, NOT 1/accuracy: Spark's QuantileSummaries maintains
    # the Greenwald-Khanna invariant g + delta <= 2*eps*n through its
    # compress/merge paths, so the honest post-merge rank bound is
    # 2*relativeError*n — at sf0.1 the sketch's p90 landed 3 ranks off
    # a 2.991-rank nominal bound (inside 5.98), which the 1/accuracy
    # bracket wrongly flagged. The bracket is the outer hull: floor on
    # the low rank, ceil on the high.
    eps = 0.0002
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    wr = W.partitionBy("prio").orderBy("cents")
    c = o.select(
        "prio",
        "cents",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(W.partitionBy("prio")).alias("n"),
    )

    def rank_at(q: float, lo: bool) -> F.Column:
        if lo:
            r = F.floor(F.lit(q) * F.col("n")).cast("bigint")
            return F.greatest(F.lit(1).cast("bigint"), r)
        r = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.least(F.col("n"), r)

    def val_at(q: float, lo: bool) -> F.Column:
        return F.max(
            F.when(F.col("rk") == rank_at(q, lo), F.col("cents"))
        ).cast("bigint")

    brackets = c.groupBy("prio").agg(
        F.max("n").alias("n"),
        val_at(0.5 - eps, True).alias("lo50"),
        val_at(0.5 + eps, False).alias("hi50"),
        val_at(0.9 - eps, True).alias("lo90"),
        val_at(0.9 + eps, False).alias("hi90"),
    )
    approx = o.groupBy("prio").agg(
        F.expr("approx_percentile(cents, array(0.5, 0.9), 10000)").alias("ap")
    )
    return (
        brackets.join(F.broadcast(approx), "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            "n",
            "lo50",
            "hi50",
            ((F.col("ap")[0] >= F.col("lo50")) & (F.col("ap")[0] <= F.col("hi50"))).alias(
                "within50"
            ),
            "lo90",
            "hi90",
            ((F.col("ap")[1] >= F.col("lo90")) & (F.col("ap")[1] <= F.col("hi90"))).alias(
                "within90"
            ),
        )
    )


@register(
    "agg_ks_drift_by_source",
    oracle="""
    WITH c AS (
      SELECT source, n_chars AS v, count(*) AS cnt
      FROM documents GROUP BY source, n_chars
    ),
    g AS (
      SELECT v, CAST(sum(cnt) AS BIGINT) AS gcnt FROM c GROUP BY v
    ),
    gc AS (
      SELECT v, CAST(sum(gcnt) OVER (ORDER BY v) AS BIGINT) AS cum_g,
             (SELECT sum(gcnt) FROM g) AS n_total
      FROM g
    ),
    ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s FROM c
           GROUP BY source),
    grid AS (
      SELECT ns.source, ns.n_s, gc.v, gc.cum_g, gc.n_total,
             COALESCE(c.cnt, 0) AS cnt
      FROM ns CROSS JOIN gc
      LEFT JOIN c ON c.source = ns.source AND c.v = gc.v
    ),
    cum AS (
      SELECT source, n_s, v, cum_g, n_total,
             CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
               AS BIGINT) AS cum_s
      FROM grid
    )
    SELECT source,
           CAST(any_value(n_s) AS BIGINT) AS n_source,
           CAST(any_value(n_total - n_s) AS BIGINT) AS n_rest,
           CAST(max(abs(cum_s * (n_total - n_s)
                        - (cum_g - cum_s) * n_s)) AS BIGINT) AS ks_scaled,
           CAST(floor(CAST(max(abs(cum_s * (n_total - n_s)
                                   - (cum_g - cum_s) * n_s)) AS DOUBLE)
                      * 1000000
                      / (CAST(any_value(n_s) AS DOUBLE)
                         * CAST(any_value(n_total - n_s) AS DOUBLE)))
             AS BIGINT) AS ks_micro
    FROM cum
    GROUP BY source
    """,
)
def agg_ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV DRIFT GATE — for every source,
    the exact KS distance between its document-length distribution and
    the REST of the corpus: the standard distribution-shift alarm a
    training-data pipeline runs before admitting a new crawl dump
    (sup-norm ECDF distance; a source whose ks_micro spikes is length-
    shifted — truncation bugs, boilerplate injection, format drift).
    Entirely exact integer arithmetic until the final report: the sup
    is max |cum_s * n_rest - cum_rest * n_s| over the pooled value
    grid (cross-multiplied ECDFs avoid division), so partial-agg order
    cannot move it; ks_micro divides once, floored, at the end.

    Scale shape: the ONLY corpus-sized operation is the first
    (source, value) count — everything downstream runs on the
    HISTOGRAM (sources x distinct values), which is domain-bounded,
    not row-bounded: the 100 TB corpus becomes a 6k-row grid here.
    The per-source cumsum windows sort the grid, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    c = c.localCheckpoint(eager=True)  # histogram feeds 3 branches
    g = c.groupBy("v").agg(F.sum("cnt").alias("gcnt"))
    gc = g.select(
        "v",
        F.sum("gcnt").over(W.orderBy("v")).alias("cum_g"),
    ).crossJoin(
        F.broadcast(g.agg(F.sum("gcnt").alias("n_total")))
    )
    ns = c.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    grid = (
        F.broadcast(ns)
        .crossJoin(gc)
        .join(c, ["source", "v"], "left")
        .select(
            "source", "n_s", "v", "cum_g", "n_total",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    cum = grid.select(
        "source", "n_s", "v", "cum_g", "n_total",
        F.sum("cnt").over(W.partitionBy("source").orderBy("v")).alias("cum_s"),
    )
    d = F.abs(
        F.col("cum_s") * (F.col("n_total") - F.col("n_s"))
        - (F.col("cum_g") - F.col("cum_s")) * F.col("n_s")
    )
    return cum.groupBy("source").agg(
        F.first("n_s").alias("n_source"),
        F.first(F.col("n_total") - F.col("n_s")).alias("n_rest"),
        F.max(d).alias("ks_scaled"),
        F.floor(
            F.max(d).cast("double")
            * 1000000
            / (
                F.first("n_s").cast("double")
                * F.first(F.col("n_total") - F.col("n_s")).cast("double")
            )
        )
        .cast("bigint")
        .alias("ks_micro"),
    )


@register(
    "agg_mannwhitney_drift",
    oracle="""
    WITH c AS (
      SELECT source, n_chars AS v, count(*) AS cnt
      FROM documents GROUP BY source, n_chars
    ),
    g AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS gcnt FROM c GROUP BY v),
    r AS (
      SELECT v, gcnt,
             CAST(2 * (sum(gcnt) OVER (ORDER BY v) - gcnt) + gcnt + 1
               AS BIGINT) AS avg2rank
      FROM g
    ),
    ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s FROM c
           GROUP BY source),
    nt AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n_total FROM g)
    SELECT c.source,
           CAST(any_value(ns.n_s) AS BIGINT) AS n_source,
           CAST(any_value(nt.n_total - ns.n_s) AS BIGINT) AS n_rest,
           CAST(sum(c.cnt * r.avg2rank) - any_value(ns.n_s)
                * (any_value(ns.n_s) + 1) AS BIGINT) AS u2_stat,
           CAST(floor(CAST(sum(c.cnt * r.avg2rank)
                           - any_value(ns.n_s) * (any_value(ns.n_s) + 1)
                        AS DOUBLE) * 1000000
                      / (2.0 * CAST(any_value(ns.n_s) AS DOUBLE)
                         * CAST(any_value(nt.n_total - ns.n_s) AS DOUBLE)))
             AS BIGINT) AS auc_micro
    FROM c
    JOIN r ON r.v = c.v
    JOIN ns ON ns.source = c.source
    CROSS JOIN nt
    GROUP BY c.source
    """,
)
def agg_mannwhitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U LOCATION-DRIFT GATE — the rank-based companion
    to agg_ks_drift_by_source: per source, the U statistic of its
    document lengths against the rest of the corpus, reported as
    auc_micro = U / (n_s * n_rest) in micro-units (the probability a
    random doc from this source is longer than a random doc from the
    rest — 0.5e6 means no shift; KS sees shape changes, U sees
    location shifts with more power). Tie handling is exact: DOUBLED
    midranks (avg2rank = 2*cum_below + cnt + 1) keep average ranks in
    integer arithmetic, so U2 = sum(cnt * avg2rank) - n_s*(n_s+1) is
    an exact BIGINT = 2U.

    Scale shape: ranks come from the VALUE HISTOGRAM cumsum — never a
    corpus-sized sort (the textbook rank() over 10^11 rows is a
    single-partition window; the histogram form is domain-bounded,
    the same discipline as the KS gate)."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    c = c.localCheckpoint(eager=True)
    g = c.groupBy("v").agg(F.sum("cnt").alias("gcnt"))
    r = g.select(
        "v",
        (
            2 * (F.sum("gcnt").over(W.orderBy("v")) - F.col("gcnt"))
            + F.col("gcnt")
            + 1
        ).alias("avg2rank"),
    )
    ns = c.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    nt = g.agg(F.sum("gcnt").alias("n_total"))
    u2 = F.sum(F.col("cnt") * F.col("avg2rank")) - F.first("n_s") * (
        F.first("n_s") + 1
    )
    return (
        c.join(F.broadcast(r), "v")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nt))
        .groupBy("source")
        .agg(
            F.first("n_s").cast("bigint").alias("n_source"),
            F.first(F.col("n_total") - F.col("n_s"))
            .cast("bigint")
            .alias("n_rest"),
            u2.cast("bigint").alias("u2_stat"),
            F.floor(
                u2.cast("double")
                * 1000000
                / (
                    2.0
                    * F.first("n_s").cast("double")
                    * F.first(F.col("n_total") - F.col("n_s")).cast("double")
                )
            )
            .cast("bigint")
            .alias("auc_micro"),
        )
    )


@register(
    "agg_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY source, lang
    ),
    rt AS (SELECT source, CAST(sum(obs) AS BIGINT) AS row_t FROM o
           GROUP BY source),
    ct AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS col_t FROM o
           GROUP BY lang),
    nt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    cells AS (
      SELECT o.source, o.lang, o.obs, rt.row_t, ct.col_t, nt.n,
             CAST(o.obs * nt.n - rt.row_t * ct.col_t AS DOUBLE)
               * CAST(o.obs * nt.n - rt.row_t * ct.col_t AS DOUBLE) AS num
      FROM o JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN nt
    )
    SELECT source,
           CAST(sum(obs) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CAST(floor(num * 1000000
                    / (CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
                       * CAST(n AS DOUBLE))) AS BIGINT)) AS BIGINT)
             AS chi2_micro
    FROM cells
    GROUP BY source
    """,
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE AUDIT of the source x lang contingency
    table — the third member of the drift-gate trio (KS: shape, U:
    location, chi2: association): a source whose language mix diverges
    from the corpus-wide expectation contributes large chi2 cells
    (mislabeled crawls, routing bugs). Per source: its summed cell
    contributions, chi2_micro = sum over cells of
    floor((O*N - RT*CT)^2 * 1e6 / (RT*CT*N)) — the deviation
    O*N - RT*CT is an EXACT BIGINT (cross-multiplied expected counts,
    no division until the report; each term is <= N^2, so the
    difference is exact up to N ~ 3e9 docs — beyond that the
    difference-of-products itself needs a double form), it is cast to
    DOUBLE BEFORE squaring on BOTH engines (dev^2 exceeds int64 at
    |dev| ~ 3e9, where Spark would wrap silently while DuckDB
    raises), each cell divides ONCE deterministically, and the
    floored integers sum associatively, so partial-agg order cannot
    move the result (floor-then-sum, the repo's invariance idiom).

    Scale shape: after the (source, lang) count, everything runs on
    the contingency table (sources x langs cells) with row/col
    marginals broadcast — domain-bounded like the KS histogram."""
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("source", "lang").agg(F.count("*").alias("obs"))
    o = o.localCheckpoint(eager=True)
    rt = o.groupBy("source").agg(F.sum("obs").alias("row_t"))
    ct = o.groupBy("lang").agg(F.sum("obs").alias("col_t"))
    nt = o.agg(F.sum("obs").alias("n"))
    dev = (
        F.col("obs") * F.col("n") - F.col("row_t") * F.col("col_t")
    ).cast("double")
    cell_micro = F.floor(
        dev * dev
        * 1000000
        / (
            F.col("row_t").cast("double")
            * F.col("col_t").cast("double")
            * F.col("n").cast("double")
        )
    ).cast("bigint")
    return (
        o.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(nt))
        .groupBy("source")
        .agg(
            F.sum("obs").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(cell_micro).cast("bigint").alias("chi2_micro"),
        )
    )


_PSI_BIN_W = 64  # fixed-width n_chars bins


@register(
    "agg_psi_drift_by_source",
    oracle=f"""
    WITH c AS (
      SELECT source, n_chars // {_PSI_BIN_W} AS b, count(*) AS cnt
      FROM documents GROUP BY source, n_chars // {_PSI_BIN_W}
    ),
    bins AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS gcnt FROM c GROUP BY b),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS k FROM bins),
    ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s FROM c
           GROUP BY source),
    tot AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n FROM bins),
    grid AS (
      SELECT ns.source, ns.n_s, bins.b, bins.gcnt,
             COALESCE(c.cnt, 0) AS cnt_s, nb.k, tot.n
      FROM ns CROSS JOIN bins CROSS JOIN nb CROSS JOIN tot
      LEFT JOIN c ON c.source = ns.source AND c.b = bins.b
    ),
    terms AS (
      SELECT source, n_s, k, n,
             (cnt_s + 1) * (n - n_s + k)
               - (gcnt - cnt_s + 1) * (n_s + k) AS num,
             CAST(round(ln(CAST((cnt_s + 1) * (n - n_s + k) AS DOUBLE)
                           / ((gcnt - cnt_s + 1) * (n_s + k)))
                        * 1000000) AS BIGINT) AS lnr
      FROM grid
    )
    SELECT source,
           CAST(any_value(n_s) AS BIGINT) AS n_source,
           CAST(any_value(n - n_s) AS BIGINT) AS n_rest,
           CAST(any_value(k) AS BIGINT) AS n_bins,
           CAST(floor(CAST(sum(num * lnr) AS DOUBLE)
                      / (CAST(any_value(n_s + k) AS DOUBLE)
                         * CAST(any_value(n - n_s + k) AS DOUBLE)))
             AS BIGINT) AS psi_micro
    FROM terms GROUP BY source
    """,
)
def agg_psi_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX drift gate — completes the drift
    quartet (KS = sup-norm ECDF, Mann-Whitney = rank shift, chi2 =
    categorical independence, PSI = binned-share divergence): for each
    source, PSI = sum over bins of (p_b - q_b) * ln(p_b / q_b) between
    its n_chars distribution and the REST of the corpus, with add-one
    smoothing so empty bins are defined. PSI is the production ML-
    monitoring standard (banking scorecards onward): > 0.1 'monitor',
    > 0.25 'shifted' — here in exact micro-nats.

    Determinism: each bin's share delta is an exact integer numerator
    over the common denominator (n_s+k)(n_r+k); the log-ratio is
    ln of an exact-integer ratio quantized to micro-nats (round-half
    idiom); their product is an exact BIGINT and every term is >= 0
    (delta and log-ratio always share sign), so the sum is partition-
    order-proof and the single floored division happens once at the
    end. Headroom: |num| <= n_s*n_r and |lnr| <= ~15e6, so int64 holds
    to ~10^5-row sources x 10^6 rest; beyond that, rescale lnr to
    deci-micro or aggregate per-shard first.

    Scale shape: identical to the KS gate — the only corpus-sized
    operation is the (source, bin) count; the grid is sources x bins
    (domain-bounded), the per-source reduce is a map-side-combined
    groupBy, and the histogram is localCheckpointed so its three
    consumers share one computation."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy(
        "source", F.expr(f"n_chars div {_PSI_BIN_W}").alias("b")
    ).agg(F.count("*").alias("cnt"))
    c = c.localCheckpoint(eager=True)
    bins = c.groupBy("b").agg(F.sum("cnt").cast("long").alias("gcnt"))
    nb = bins.agg(F.count("*").cast("long").alias("k"))
    ns = c.groupBy("source").agg(F.sum("cnt").cast("long").alias("n_s"))
    tot = bins.agg(F.sum("gcnt").cast("long").alias("n"))
    grid = (
        F.broadcast(ns)
        .crossJoin(bins)
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(tot))
        .join(c, ["source", "b"], "left")
        .select(
            "source",
            "n_s",
            "b",
            "gcnt",
            F.coalesce("cnt", F.lit(0)).alias("cnt_s"),
            "k",
            "n",
        )
    )
    p_num = (F.col("cnt_s") + 1) * (F.col("n") - F.col("n_s") + F.col("k"))
    q_num = (F.col("gcnt") - F.col("cnt_s") + 1) * (F.col("n_s") + F.col("k"))
    terms = grid.select(
        "source",
        "n_s",
        "k",
        "n",
        (p_num - q_num).alias("num"),
        F.round(F.log(p_num.cast("double") / q_num) * 1000000)
        .cast("long")
        .alias("lnr"),
    )
    return terms.groupBy("source").agg(
        F.first("n_s").cast("bigint").alias("n_source"),
        F.first(F.col("n") - F.col("n_s")).cast("bigint").alias("n_rest"),
        F.first("k").cast("bigint").alias("n_bins"),
        F.floor(
            F.sum(F.col("num") * F.col("lnr")).cast("double")
            / (
                F.first(F.col("n_s") + F.col("k")).cast("double")
                * F.first(F.col("n") - F.col("n_s") + F.col("k")).cast("double")
            )
        )
        .cast("bigint")
        .alias("psi_micro"),
    )


_LDIV_L = 3  # minimum distinct sensitive values per equivalence class


@register(
    "audit_l_diversity",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0)
                  AS BIGINT) AS bal_bucket
      FROM customer
    ),
    cells AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(count(*)) OVER
                  (PARTITION BY c_nationkey, c_mktsegment) AS BIGINT) AS tot
      FROM q GROUP BY c_nationkey, c_mktsegment, bal_bucket
    ),
    cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(sum(cnt) AS BIGINT) AS class_size,
             CAST(count(*) AS BIGINT) AS l_distinct,
             CAST(sum(cnt * CAST(round(ln(CAST(cnt AS DOUBLE) / tot)
                                       * 1000000) AS BIGINT))
                  AS BIGINT) AS s
      FROM cells GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
           CAST((-s) // class_size AS BIGINT) AS entropy_micro_nats,
           CAST(CASE WHEN l_distinct < {_LDIV_L} THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk
    FROM cls
    """,
)
def audit_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit (Machanavajjhala et al., ICDE 2006) — the
    privacy gate k-anonymity alone cannot provide: a class of 50
    customers is still fully disclosed if every one of them shares the
    same sensitive value. Over the same quasi-identifier classes as
    audit_k_anonymity (nation x market segment), the sensitive
    attribute (the $1000 balance bucket) must take at least
    l={_LDIV_L} distinct values per class; the query also reports
    Shannon entropy of the within-class sensitive distribution in
    micro-nats (entropy l-diversity, the stricter criterion) via the
    established per-term idiom: each ln(p) is rounded to an exact
    micro-nat integer, weighted by its exact count, and the integer
    sum divides by class size — order-free, engine-exact
    (nonnegative operands, so truncating and flooring division
    agree).

    Scale shape: two stacked map-side-combinable aggregates (cell
    counts, then class rollup) — shuffle volume is O(distinct QI x
    sensitive cells), independent of row count. The within-class
    normalizer rides the same aggregate (no second scan)."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    cells = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(cents / 100000.0).cast("bigint").alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wcls = W.partitionBy("c_nationkey", "c_mktsegment")
    terms = cells.select(
        "c_nationkey",
        "c_mktsegment",
        "cnt",
        (
            F.col("cnt")
            * F.round(
                F.log(F.col("cnt").cast("double") / F.sum("cnt").over(wcls))
                * 1000000
            ).cast("long")
        ).alias("t"),
    )
    cls = terms.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("class_size"),
        F.count("*").cast("bigint").alias("l_distinct"),
        F.sum("t").cast("bigint").alias("s"),
    )
    return cls.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "l_distinct",
        F.expr("(-s) div class_size").cast("bigint").alias("entropy_micro_nats"),
        F.when(F.col("l_distinct") < _LDIV_L, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("at_risk"),
    )


_TCLOSE_T_MICRO = 150000  # t = 0.15 — the release gate on EMD


@register(
    "audit_t_closeness",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0)
                  AS BIGINT) AS bal_bucket
      FROM customer
    ),
    cells AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM q GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT bal_bucket, CAST(sum(cnt) AS BIGINT) AS gcnt,
             CAST(sum(sum(cnt)) OVER (ORDER BY bal_bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cg
      FROM cells GROUP BY bal_bucket
    ),
    tot AS (
      SELECT CAST(sum(gcnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS m
      FROM g
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment, CAST(sum(cnt) AS BIGINT) AS class_size
      FROM cells GROUP BY 1, 2
    ),
    grid AS (
      SELECT cl.c_nationkey, cl.c_mktsegment, cl.class_size,
             g.bal_bucket, g.cg, COALESCE(ce.cnt, 0) AS cnt
      FROM classes cl CROSS JOIN g
      LEFT JOIN cells ce ON ce.c_nationkey = cl.c_nationkey
            AND ce.c_mktsegment = cl.c_mktsegment
            AND ce.bal_bucket = g.bal_bucket
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, class_size, cg,
             CAST(sum(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                  ORDER BY bal_bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cc
      FROM grid
    )
    SELECT c_nationkey, c_mktsegment, class_size,
           CAST(sum(abs((cc * 1000000) // class_size
                        - (cg * 1000000) // tot.n))
                // greatest(tot.m - 1, 1) AS BIGINT) AS t_micro,
           CAST(CASE WHEN sum(abs((cc * 1000000) // class_size
                                  - (cg * 1000000) // tot.n))
                          // greatest(tot.m - 1, 1)
                          > {_TCLOSE_T_MICRO}
                     THEN 1 ELSE 0 END AS BIGINT) AS at_risk
    FROM cum, tot
    GROUP BY c_nationkey, c_mktsegment, class_size, tot.n, tot.m
    """,
)
def audit_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the third leg of the privacy trio: l-diversity still leaks when a
    class's sensitive values are diverse but SKEWED relative to the
    population (all-low balances in one nation x segment class is a
    disclosure even at l=5). For each quasi-identifier class, Earth
    Mover's Distance between the class's sensitive distribution and
    the GLOBAL one over the ordered $1000 balance buckets; for an
    ordinal attribute EMD is the mean absolute cumulative-probability
    gap: per bucket, both cumulative probabilities quantize to exact
    micro units FIRST ((cum*1e6) div size — the per-term-floor
    discipline, which keeps every intermediate bounded by ~1e13 at ANY
    scale factor; the common-denominator form cum_class*N overflows
    int64 near N=1.5e7), their absolute gaps sum over the bucket grid
    (the final bucket's gap is zero by construction, so the sum IS the
    (m-1)-term EMD numerator), then one flooring division by m-1 —
    order-free, engine-exact, quantization bounded by m microunits.
    Classes with t above {_TCLOSE_T_MICRO} micro (t=0.15) are flagged.

    Scale shape: cell counts aggregate map-side (O(QI x buckets)
    cells); the grid is classes x buckets — dimension-sized — built
    from a broadcast of the bucket histogram; nothing downstream of
    the first aggregate is proportional to the row count."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    cells = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(cents / 100000.0).cast("bigint").alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    gw = W.orderBy("bal_bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    g = (
        cells.groupBy("bal_bucket")
        .agg(F.sum("cnt").cast("bigint").alias("gcnt"))
        .select(
            "bal_bucket", F.sum("gcnt").over(gw).cast("bigint").alias("cg")
        )
    )
    tot = g.agg(
        F.max("cg").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("m"),
    )
    classes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("class_size")
    )
    grid = (
        classes.join(F.broadcast(g))
        .join(
            cells,
            ["c_nationkey", "c_mktsegment", "bal_bucket"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "bal_bucket",
            "cg",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    cw = W.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "bal_bucket"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "cg",
        F.sum("cnt").over(cw).cast("bigint").alias("cc"),
    ).join(F.broadcast(tot))
    term = F.abs(
        F.expr("(cc * 1000000) div class_size")
        - F.expr("(cg * 1000000) div n")
    )
    out = cum.groupBy("c_nationkey", "c_mktsegment", "class_size", "n", "m").agg(
        F.sum(term).cast("bigint").alias("emd_num")
    )
    return out.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        F.expr("emd_num div greatest(m - 1, 1)")
        .cast("bigint")
        .alias("t_micro"),
        F.when(
            F.expr("emd_num div greatest(m - 1, 1)") > _TCLOSE_T_MICRO,
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("at_risk"),
    )


_DP_DENOM = 2**32


def _dp_hex8_sql(hexpr: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {1 + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


@register(
    "audit_dp_noisy_counts",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY event_type
    ),
    seeded AS (
      SELECT event_type, true_count,
             CAST({_dp_hex8_sql("md5('dp:' || event_type)")} AS BIGINT)
               AS u32
      FROM counts
    ),
    lap AS (
      SELECT event_type, true_count,
             2 * u32 + 1 - {_DP_DENOM} AS d_num,
             CAST(round(ln(CAST({_DP_DENOM} - abs(2 * u32 + 1 - {_DP_DENOM})
                               AS DOUBLE) / {_DP_DENOM}) * 1000000)
                  AS BIGINT) AS lnmicro
      FROM seeded
    )
    SELECT event_type, true_count,
           CAST(CASE WHEN d_num > 0 THEN -lnmicro ELSE lnmicro END
                AS BIGINT) AS noise_micro,
           CAST(true_count * 1000000
                + CASE WHEN d_num > 0 THEN -lnmicro ELSE lnmicro END
                AS BIGINT) AS noisy_count_micro,
           CAST(1000 AS BIGINT) AS epsilon_milli
    FROM lap
    """,
)
def audit_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE NOISY COUNT RELEASE (Dwork et al., TCC
    2006 — the Laplace mechanism), with the noise drawn from a SEEDED
    salted-hash uniform so the release is REPRODUCIBLE — the property
    a governed pipeline needs to re-emit identical numbers on re-run
    and audit (a rand()-seeded release changes every execution and is
    unreviewable). Per event type: u = (2*h + 1)/2^33 from the md5
    hash (an exact dyadic rational, never 0 or 1/2 — the numerator is
    odd), and Laplace(1/eps) noise via the inverse CDF
    -sign(u - 1/2) * ln(1 - 2|u - 1/2|) at eps=1. Determinism: the ln
    argument is the IDENTICAL exact rational on both engines and the
    result lands in the established micro-nat round(ln*1e6) integer
    idiom, so noise, sign, and the released noisy micro-count are all
    exact integer arithmetic. The true count rides along as the
    attestation column (the mechanism gate, not the release — a real
    release publishes only the noisy column, and composition
    accounting would track eps spend per query).

    Scale shape: one map-side-combinable groupBy; the noise is a
    projection on the (low-cardinality) aggregate. Zero extra
    exchanges at any corpus size."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    lap = counts.select(
        "event_type",
        "true_count",
        (2 * u32 + 1 - _DP_DENOM).alias("d_num"),
        F.round(
            F.log(
                (_DP_DENOM - F.abs(2 * u32 + 1 - _DP_DENOM)).cast("double")
                / _DP_DENOM
            )
            * 1000000
        )
        .cast("bigint")
        .alias("lnmicro"),
    )
    noise = F.when(F.col("d_num") > 0, -F.col("lnmicro")).otherwise(
        F.col("lnmicro")
    )
    return lap.select(
        "event_type",
        "true_count",
        noise.cast("bigint").alias("noise_micro"),
        (F.col("true_count") * 1000000 + noise)
        .cast("bigint")
        .alias("noisy_count_micro"),
        F.lit(1000).cast("bigint").alias("epsilon_milli"),
    )


_EXPLODE_TOPK = 10
_EXPLODE_TASK_ROWS = 100_000  # target output rows per (salted) task


@register(
    "audit_join_explosion",
    oracle=f"""
    WITH n AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(sum(n_rows * n_rows) AS BIGINT) AS t FROM n
    )
    SELECT user_id, n_rows,
           CAST(n_rows * n_rows AS BIGINT) AS est_pairs,
           CAST(floor(n_rows * n_rows * 1000000.0 / t) AS BIGINT)
             AS share_ppm,
           CAST((n_rows * n_rows + {_EXPLODE_TASK_ROWS - 1})
                  // {_EXPLODE_TASK_ROWS} AS BIGINT) AS salt_factor
    FROM n, tot
    ORDER BY est_pairs DESC, user_id
    LIMIT {_EXPLODE_TOPK}
    """,
)
def audit_join_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-EXPLOSION PRE-FLIGHT — the row-multiplicity audit a 100 TB
    join runs BEFORE shuffling anything: for a candidate equi-join key
    (here the classic self-join on events.user_id — the sessionization
    / pair-mining shape where output per key is n², the quadratic
    blowup that silently turns a 1 TB input into a 100 TB shuffle),
    report the top-{_EXPLODE_TOPK} keys by estimated output rows, each
    key's share of the total estimated output, and the SALT FACTOR
    that would cap a task at ~{_EXPLODE_TASK_ROWS} output rows — the
    number join_skew_salted's salting actually needs.
    audit_partition_skew measures reducer imbalance of the INPUT; this
    measures blowup of the OUTPUT, which is what OOMs a join.

    Scale shape: per-key counts are one map-side-combined groupBy
    (O(distinct keys) shuffle, never the rows); the total is a 1-row
    aggregate broadcast back; top-k is orderBy().limit() =
    TakeOrderedAndProject (per-partition heaps, no global sort). The
    share uses double division (est_pairs ≤ total, and doubles cannot
    overflow where bigint micro-products would at 10^13+ total
    pairs — the audit_t_closeness overflow lesson)."""
    ev = load_table(spark, sf_dir, "events")
    n = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n_rows"))
    tot = n.agg(
        F.sum(F.col("n_rows") * F.col("n_rows")).cast("bigint").alias("t")
    )
    est = F.col("n_rows") * F.col("n_rows")
    return (
        n.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_rows",
            est.cast("bigint").alias("est_pairs"),
            F.floor(est * 1000000.0 / F.col("t"))
            .cast("bigint")
            .alias("share_ppm"),
            F.expr(
                f"(n_rows * n_rows + {_EXPLODE_TASK_ROWS - 1})"
                f" div {_EXPLODE_TASK_ROWS}"
            )
            .cast("bigint")
            .alias("salt_factor"),
        )
        .orderBy(F.col("est_pairs").desc(), F.col("user_id").asc())
        .limit(_EXPLODE_TOPK)
    )


# (column, spark string-normalization expr, duckdb equivalent) — the
# canonical cross-engine string form per type: ints/strings/dates cast
# verbatim (both engines render ISO dates), money through exact cents
# (double→string rendering differs between engines, the _cents rule)
_PROFILE_COLS = [
    ("o_orderkey", "cast(o_orderkey as string)", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "cast(o_custkey as string)", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    (
        "o_totalprice_cents",
        "cast(cast(round(o_totalprice * 100) as bigint) as string)",
        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
    ),
    ("o_orderdate", "cast(o_orderdate as string)", "CAST(o_orderdate AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
]


@register(
    "audit_column_profile",
    oracle=f"""
    WITH u AS (
      {" UNION ALL ".join(f"SELECT '{n}' AS col, {d} AS val FROM orders" for n, _s, d in _PROFILE_COLS)}
    ),
    vc AS (
      SELECT col, val, CAST(count(*) AS BIGINT) AS c
      FROM u GROUP BY col, val
    ),
    top AS (
      SELECT col, val AS top_value, c AS top_count FROM (
        SELECT col, val, c,
               row_number() OVER (PARTITION BY col
                                  ORDER BY c DESC, val NULLS LAST)
                 AS rn
        FROM vc) WHERE rn = 1
    ),
    prof AS (
      SELECT col,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN val IS NULL THEN c ELSE 0 END) AS BIGINT)
               AS n_null,
             CAST(count(val) AS BIGINT) AS n_distinct,
             min(val) AS min_val,
             max(val) AS max_val
      FROM vc GROUP BY col
    )
    SELECT p.col AS column_name, p.n_rows, p.n_null, p.n_distinct,
           p.min_val, p.max_val, t.top_value, t.top_count
    FROM prof p JOIN top t USING (col)
    """,
)
def audit_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS TABLE PROFILER — the ANALYZE/data-catalog statistics
    sweep every ingest runs before trusting a new 100 TB drop: for
    every column of ``orders``, row count, null count, EXACT distinct
    count, min/max, and the modal value with its frequency (ties:
    highest count, then lexicographic — a total order). Values cross
    the engine boundary in a canonical per-type string form (ints and
    dates verbatim — both engines render ISO dates — money via exact
    cents, the repo's double-rendering rule), so the profile itself is
    oracle-attested, not just sampled.

    Scale shape: ONE scan; the unpivot fans each row into
    {len(_PROFILE_COLS)} (column, value) pairs that immediately
    collapse in a map-side-combined groupBy (column, value) — the
    shuffle carries one row per DISTINCT value per column (the
    value-histogram size, not the table size), and everything after
    (profile + mode) runs on that histogram. A profile of a wider
    table adds arms to the same stack expression, not passes."""
    orders = load_table(spark, sf_dir, "orders")
    arms = ", ".join(f"'{n}', {s}" for n, s, _d in _PROFILE_COLS)
    u = orders.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {arms}) as (col, val)"
        )
    )
    vc = u.groupBy("col", "val").agg(F.count("*").cast("bigint").alias("c"))
    # NULLS LAST spelled out on BOTH sides: Spark defaults NULLS FIRST
    # asc, DuckDB LAST — a NULL-bearing column whose null-count ties
    # the mode would otherwise diverge (round-11 review finding)
    wtop = W.partitionBy("col").orderBy(
        F.col("c").desc(), F.col("val").asc_nulls_last()
    )
    top = (
        vc.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "col",
            F.col("val").alias("top_value"),
            F.col("c").alias("top_count"),
        )
    )
    prof = vc.groupBy("col").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.count("val").cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    return prof.join(top, "col").select(
        F.col("col").alias("column_name"),
        "n_rows",
        "n_null",
        "n_distinct",
        "min_val",
        "max_val",
        "top_value",
        "top_count",
    )


@register(
    "audit_merkle_table_digest",
    oracle="""
    WITH r AS (
      SELECT md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)) AS rd
      FROM documents
    ),
    leaves AS (
      SELECT substr(rd, 1, 1) AS bucket,
             md5(string_agg(rd, '' ORDER BY rd)) AS digest,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM r GROUP BY substr(rd, 1, 1)
    )
    SELECT CAST(0 AS BIGINT) AS level, bucket, digest, n_rows FROM leaves
    UNION ALL
    SELECT CAST(1 AS BIGINT), NULL,
           md5(string_agg(digest, '' ORDER BY bucket)),
           CAST(sum(n_rows) AS BIGINT)
    FROM leaves
    """,
)
def audit_merkle_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERKLE TABLE DIGEST — content-addressed equality proof for a
    table: every row hashes to a digest, digests roll up into
    prefix-bucket leaves (sorted within the leaf, so the leaf digest
    is ORDER-FREE over any physical layout), and the leaves roll up
    into one root. Two sites each compute this locally and compare a
    handful of hashes instead of shipping 100 TB: a root mismatch
    localizes to the differing leaf (then to the differing rows by
    re-bucketing inside it) — the rsync/Dynamo anti-entropy shape as
    a query, and the missing audit between sink_wap_publish
    (single-table integrity) and audit_referential_integrity
    (cross-table keys).

    Scale shape: one scan to row digests; ONE shuffle keyed by digest
    prefix. Leaves here use a 1-hex-digit fan-out (16 buckets — the
    sf-scale choice); at 100 TB the same plan widens the prefix (4
    hex digits = 65k leaves) and adds a middle level, keeping every
    collect bounded — the tree DEPTH is the knob, the plan shape is
    fixed. Both engines agg sorted-by-digest strings, so the result
    is layout- and partition-invariant by construction."""
    docs = load_table(spark, sf_dir, "documents")
    r = docs.select(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("|"),
                F.md5(F.col("text")),
            )
        ).alias("rd")
    )
    leaves = (
        r.groupBy(F.substring("rd", 1, 1).alias("bucket"))
        .agg(
            F.md5(
                F.array_join(F.array_sort(F.collect_list("rd")), "")
            ).alias("digest"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        .localCheckpoint(eager=True)  # leaves + root share it
    )
    root = leaves.agg(
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(bucket, digest))), x -> x.digest)"
                ),
                "",
            )
        ).alias("digest"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )
    return leaves.select(
        F.lit(0).cast("bigint").alias("level"), "bucket", "digest", "n_rows"
    ).unionByName(
        root.select(
            F.lit(1).cast("bigint").alias("level"),
            F.lit(None).cast("string").alias("bucket"),
            "digest",
            "n_rows",
        )
    )


# --------------------------------------------------------------------------
# Functional-dependency audit (one-pass determinant profiling)
# --------------------------------------------------------------------------

# (fd_name, table, determinant columns, dependent column). A deliberate
# mix of key-backed dependencies that must HOLD and plausible-looking
# business rules that data actually violates — the profiler's job is to
# measure, not assume.
_FD_CANDIDATES = [
    ("orders.o_orderkey->o_orderstatus", "orders", ["o_orderkey"], "o_orderstatus"),
    ("orders.o_custkey->o_orderpriority", "orders", ["o_custkey"], "o_orderpriority"),
    ("lineitem.pk->l_quantity", "lineitem", ["l_orderkey", "l_linenumber"], "l_quantity"),
    ("lineitem.l_orderkey->l_returnflag", "lineitem", ["l_orderkey"], "l_returnflag"),
    ("customer.c_nationkey->c_mktsegment", "customer", ["c_nationkey"], "c_mktsegment"),
    ("nation.n_regionkey->n_name", "nation", ["n_regionkey"], "n_name"),
    ("events.user_id->event_type", "events", ["user_id"], "event_type"),
    ("documents.source->lang", "documents", ["source"], "lang"),
]


def _fd_oracle() -> str:
    arms = []
    for name, tbl, det, dep in _FD_CANDIDATES:
        # NULL-sentinel each column BEFORE concatenation: DuckDB ||
        # propagates NULL while Spark concat_ws skips it — coalescing
        # to a chr(2) sentinel makes both engines group NULL
        # determinants identically (and distinctly from '')
        detkey = " || chr(1) || ".join(
            f"COALESCE(CAST({c} AS VARCHAR), chr(2))" for c in det
        )
        arms.append(
            f"SELECT '{name}' AS fd, {detkey} AS det,"
            f" CAST({dep} AS VARCHAR) AS dep FROM {tbl}"
        )
    union = "\n      UNION ALL ".join(arms)
    return f"""
    WITH pairs AS (
      {union}
    ),
    per_det AS (
      SELECT fd, det,
             CAST(count(DISTINCT dep) AS BIGINT) AS n_dep
      FROM pairs GROUP BY fd, det
    )
    SELECT fd,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(max(n_dep) AS BIGINT) AS max_distinct_dep,
           CAST(CASE WHEN max(n_dep) = 1 THEN 1 ELSE 0 END AS INT) AS holds,
           CAST(floor(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
                      * 1000000.0 / count(*)) AS BIGINT) AS violation_ppm
    FROM per_det GROUP BY fd
    """


@register("audit_fd_violations", oracle=_fd_oracle())
def audit_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY AUDIT — for each candidate rule X -> Y in
    a curated list ({len(_FD_CANDIDATES)} across five tables), how
    many determinant groups exist, how many are VIOLATED (more than
    one distinct dependent), and how badly (max distinct dependents,
    violation ppm)? This is the schema-inference half of data-quality
    profiling (Papenbrock et al., PVLDB 8(10), on FD discovery;
    audit_dq_expectations checks row-level rules, this checks
    RELATIONSHIPS): key-backed FDs must hold exactly (a violation is
    corruption upstream), while plausible business rules that fail
    with high ppm are join-denormalization hazards — materializing a
    dimension off a violated FD silently picks arbitrary winners.

    The candidate list deliberately mixes both kinds: orders'
    o_orderkey rule reports holds=1 (a real key), distribution rules
    (customer nation->segment, events user->type) report their
    violation ppm as the measurement — and the nominal lineitem
    (l_orderkey, l_linenumber) "primary key" turns out VIOLATED in
    the synthetic data (the generator reuses line numbers), which is
    precisely the silent upstream corruption this audit exists to
    surface before a merge/upsert keyed on it picks arbitrary
    winners.

    Scale shape: ONE pass — every candidate projects its (fd, det,
    dep) pairs from a column-pruned scan (Parquet reads only the
    referenced columns, checked via ReadSchema), the union shuffles
    once on (fd, det) for the distinct-dependent count (partial
    aggregation applies: duplicate (fd, det, dep) triples collapse
    map-side), and the per-FD rollup is group-count-sized. Adding a
    candidate adds a projection, never a new scan pattern; the
    determinant key is a chr(1)-joined string, so composite
    determinants ride the same relation.

    r15 examined-no-change: a one-scan-PER-TABLE variant (all of a
    table's rules emitted from one projected scan via array+explode —
    identical pair multiset) was built and measured: 2.39 -> 3.08 s
    paired at sf0.1 (anchor 0.53 -> 0.44) — the Generate's 3x row
    materialization costs more than the page-cached re-scans save
    locally. At 100 TB the tradeoff flips (lineitem read 3x vs once),
    but per the r14 hurst lesson a measured local regression does not
    ship on scale grounds alone; revisit if the bench SF ever grows."""
    parts = []
    for name, tbl, det, dep in _FD_CANDIDATES:
        src = _t(spark, sf_dir, tbl)
        detkey = F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
                for c in det
            ],
        )
        parts.append(
            src.select(
                F.lit(name).alias("fd"),
                detkey.alias("det"),
                F.col(dep).cast("string").alias("dep"),
            )
        )
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.unionByName(p)
    per_det = pairs.groupBy("fd", "det").agg(
        F.count_distinct("dep").cast("bigint").alias("n_dep")
    )
    return per_det.groupBy("fd").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating"),
        F.max("n_dep").cast("bigint").alias("max_distinct_dep"),
        F.when(F.max("n_dep") == 1, 1).otherwise(0).cast("int").alias("holds"),
        F.floor(
            F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
            * 1000000.0
            / F.count("*")
        )
        .cast("bigint")
        .alias("violation_ppm"),
    )


# --------------------------------------------------------------------------
# Cramer's V association matrix (bias-corrected, integer-quantized chi2)
# --------------------------------------------------------------------------

# (pair_name, table, expr_a, expr_b) — SQL expressions valid in BOTH
# engines (plain columns, or hour(ts) // 4 written per dialect below).
_CV_PAIRS = [
    ("orders.status_x_priority", "orders", "o_orderstatus", "o_orderpriority"),
    ("customer.segment_x_nation", "customer", "c_mktsegment", "c_nationkey"),
    ("documents.source_x_lang", "documents", "source", "lang"),
    ("lineitem.returnflag_x_linestatus", "lineitem", "l_returnflag", "l_linestatus"),
    ("events.type_x_hourband", "events", "event_type", "__HOURBAND__"),
]


def _cramers_oracle() -> str:
    arms = []
    for name, tbl, a, b in _CV_PAIRS:
        bexpr = "(hour(ts) // 4)" if b == "__HOURBAND__" else b
        arms.append(
            f"SELECT '{name}' AS pair, CAST({a} AS VARCHAR) AS a,"
            f" CAST({bexpr} AS VARCHAR) AS b FROM {tbl}"
        )
    union = "\n      UNION ALL ".join(arms)
    return f"""
    WITH obs AS (
      {union}
    ),
    cell AS (
      SELECT pair, a, b, CAST(count(*) AS BIGINT) AS nij
      FROM obs GROUP BY pair, a, b
    ),
    marg AS (
      SELECT pair, a, b, nij,
             sum(nij) OVER (PARTITION BY pair, a) AS ri,
             sum(nij) OVER (PARTITION BY pair, b) AS cj,
             sum(nij) OVER (PARTITION BY pair) AS n
      FROM cell
    ),
    terms AS (
      SELECT pair, n,
             CAST(round(
               (CAST(nij AS DOUBLE) * n - CAST(ri AS DOUBLE) * cj)
               * (CAST(nij AS DOUBLE) * n - CAST(ri AS DOUBLE) * cj)
               / (CAST(n AS DOUBLE) * ri * cj) * 1000000
             ) AS BIGINT) AS term_micro,
             a, b
      FROM marg
    ),
    per AS (
      SELECT pair, CAST(max(n) AS BIGINT) AS n,
             CAST(count(DISTINCT a) AS BIGINT) AS r,
             CAST(count(DISTINCT b) AS BIGINT) AS c,
             CAST(sum(term_micro) AS BIGINT) AS chi2_micro
      FROM terms GROUP BY pair
    )
    SELECT pair, n, r, c, chi2_micro,
           CAST(round(sqrt(chi2_micro / 1000000.0
                           / (CAST(n AS DOUBLE) * (least(r, c) - 1)))
                      * 1000) AS BIGINT) AS v_milli,
           CAST(round(sqrt(
             greatest(0.0,
               chi2_micro / 1000000.0 / n
               - (CAST(r AS DOUBLE) - 1) * (c - 1) / (n - 1))
             / (least(r - (CAST(r AS DOUBLE) - 1) * (r - 1) / (n - 1),
                      c - (CAST(c AS DOUBLE) - 1) * (c - 1) / (n - 1))
                - 1)) * 1000) AS BIGINT) AS v_corr_milli
    FROM per
    """


@register("agg_cramers_v", oracle=_cramers_oracle())
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER'S V ASSOCIATION MATRIX — effect size for every curated
    categorical column pair ({len(_CV_PAIRS)} across five tables),
    both the classic V = sqrt(chi2 / (n * (min(r,c)-1))) and the
    BIAS-CORRECTED V~ (Bergsma, J. Korean Stat. Soc. 42, 2013) that
    strips the positive bias chi2 accumulates from sparse
    contingency cells — the honest number when cardinalities differ
    wildly (nationkey x segment). Where agg_chi2_independence answers
    "is THIS pair independent?" with a p-value, this ranks MANY pairs
    on one comparable 0..1 scale: the feature-redundancy /
    leakage-screening pass before training (a pair with V~ ~ 1 is
    one column pretending to be two).

    Determinism: each contingency cell's chi2 term
    (nij*n - ri*cj)^2 / (n*ri*cj) is computed in double from EXACT
    integer counts and quantized to integer micro-units BEFORE the
    per-pair sum (the established term-quantization discipline), so
    the aggregate is partition-invariant; V and V~ are one
    closed-form expression per pair over the pinned integers. The
    double products are exact up to nij*n < 2^53 (~9e15 cell-count
    product — the audit_t_closeness overflow lesson, documented
    bound).

    Scale shape: ONE union pass over column-pruned scans collapses to
    contingency cells (map-side combined — cells, not rows, cross the
    wire); margins are window sums over the CELL table (categorical-
    cardinality-sized); the final reduce is one row per pair. Adding
    a pair adds a projection to the union, never a new shuffle
    pattern."""
    parts = []
    for name, tbl, a, b in _CV_PAIRS:
        src = _t(spark, sf_dir, tbl)
        bcol = (
            F.expr("hour(ts) div 4") if b == "__HOURBAND__" else F.col(b)
        )
        parts.append(
            src.select(
                F.lit(name).alias("pair"),
                F.col(a).cast("string").alias("a"),
                bcol.cast("string").alias("b"),
            )
        )
    obs = parts[0]
    for p in parts[1:]:
        obs = obs.unionByName(p)
    cell = obs.groupBy("pair", "a", "b").agg(
        F.count("*").cast("bigint").alias("nij")
    )
    marg = cell.select(
        "pair",
        "a",
        "b",
        "nij",
        F.sum("nij").over(W.partitionBy("pair", "a")).alias("ri"),
        F.sum("nij").over(W.partitionBy("pair", "b")).alias("cj"),
        F.sum("nij").over(W.partitionBy("pair")).alias("n"),
    )
    dev = F.col("nij").cast("double") * F.col("n") - F.col("ri").cast(
        "double"
    ) * F.col("cj")
    terms = marg.select(
        "pair",
        "n",
        "a",
        "b",
        F.round(
            dev
            * dev
            / (F.col("n").cast("double") * F.col("ri") * F.col("cj"))
            * 1000000
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    per = terms.groupBy("pair").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count_distinct("a").cast("bigint").alias("r"),
        F.count_distinct("b").cast("bigint").alias("c"),
        F.sum("term_micro").cast("bigint").alias("chi2_micro"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    cd = F.col("c").cast("double")
    phi2 = F.col("chi2_micro") / 1000000.0 / nd
    phi2c = F.greatest(
        F.lit(0.0), phi2 - (rd - 1) * (cd - 1) / (nd - 1)
    )
    rprime = rd - (rd - 1) * (rd - 1) / (nd - 1)
    cprime = cd - (cd - 1) * (cd - 1) / (nd - 1)
    return per.select(
        "pair",
        "n",
        "r",
        "c",
        "chi2_micro",
        F.round(
            F.sqrt(
                F.col("chi2_micro")
                / 1000000.0
                / (nd * (F.least(F.col("r"), F.col("c")) - 1))
            )
            * 1000
        )
        .cast("bigint")
        .alias("v_milli"),
        F.round(
            F.sqrt(phi2c / (F.least(rprime, cprime) - 1)) * 1000
        )
        .cast("bigint")
        .alias("v_corr_milli"),
    )


# --------------------------------------------------------------------------
# Hill tail-index estimator (extreme-value heaviness from top-k order stats)
# --------------------------------------------------------------------------

_HILL_K = 100  # tail order statistics per group


@register(
    "agg_hill_tail_index",
    oracle=f"""
    WITH r AS (
      SELECT event_type, value, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY value DESC, event_id ASC) AS rk
      FROM events WHERE value > 0
    ),
    top AS (SELECT * FROM r WHERE rk <= {_HILL_K + 1}),
    thr AS (
      SELECT event_type, max(value) AS x_thr
      FROM top WHERE rk = {_HILL_K + 1} GROUP BY event_type
    ),
    lnr AS (
      SELECT t.event_type,
             CAST(round(ln(t.value / th.x_thr) * 1000000) AS BIGINT)
               AS ln_micro
      FROM top t JOIN thr th ON th.event_type = t.event_type
      WHERE t.rk <= {_HILL_K}
    )
    SELECT l.event_type, CAST({_HILL_K} AS BIGINT) AS k,
           th.x_thr,
           CAST(sum(l.ln_micro) AS BIGINT) AS sum_ln_micro,
           CAST(sum(l.ln_micro) // {_HILL_K} AS BIGINT) AS hill_micro,
           CAST(round({_HILL_K} * 1000000000.0 / sum(l.ln_micro))
             AS BIGINT) AS alpha_milli
    FROM lnr l JOIN thr th ON th.event_type = l.event_type
    GROUP BY l.event_type, th.x_thr
    """,
)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILL TAIL-INDEX ESTIMATOR (Hill, Ann. Stat. 3(5) 1975) per
    event type over `value`: from the top {_HILL_K}+1 order
    statistics, hill = mean ln(x_i / x_(k+1)) estimates the inverse
    tail exponent 1/alpha of a Pareto-like upper tail — the
    extreme-value heaviness number behind p999 capacity planning:
    alpha <= 2 means infinite variance (sample means of load NEVER
    stabilize — autoscaling on averages is wrong), alpha <= 1 means
    even the mean diverges. sketch_ddsketch_quantiles reads the tail
    at fixed ranks; Hill says how fast it keeps growing BEYOND any
    rank you picked — the difference between provisioning for p999
    and knowing p9999 is 10x further out.

    Determinism: the top-(k+1) set is picked under the total order
    (value DESC, event_id ASC) so ties cannot shuffle membership
    between engines; each ratio's ln quantizes to integer micro-nats
    (the lnu_micro idiom) BEFORE the sum, the mean is exact integer
    division, and alpha is one closed-form double over the pinned
    integer sum.

    Scale shape: the per-group top-k window compiles to a map-side
    WindowGroupLimit (the sample_weighted_reservoir discipline) —
    each input partition forwards at most {_HILL_K + 1} rows per
    group, so the single exchange moves O(groups x partitions x k)
    rows, never the stream; everything after runs on k rows per
    group. At 100 TB this is the canonical 'order statistics without
    a global sort' shape."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = W.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    top = (
        ev.select("event_type", "value", "event_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HILL_K + 1)
    )
    thr = (
        top.filter(F.col("rk") == _HILL_K + 1)
        .groupBy("event_type")
        .agg(F.max("value").alias("x_thr"))
    )
    lnr = (
        top.filter(F.col("rk") <= _HILL_K)
        .join(F.broadcast(thr), "event_type")
        .select(
            "event_type",
            "x_thr",
            F.round(F.log(F.col("value") / F.col("x_thr")) * 1000000)
            .cast("bigint")
            .alias("ln_micro"),
        )
    )
    return lnr.groupBy("event_type", "x_thr").agg(
        F.lit(_HILL_K).cast("bigint").alias("k"),
        F.sum("ln_micro").cast("bigint").alias("sum_ln_micro"),
        F.expr(f"sum(ln_micro) div {_HILL_K}").cast("bigint").alias(
            "hill_micro"
        ),
        F.round(_HILL_K * 1000000000.0 / F.sum("ln_micro"))
        .cast("bigint")
        .alias("alpha_milli"),
    ).select(
        "event_type", "k", "x_thr", "sum_ln_micro", "hill_micro",
        "alpha_milli",
    )


@register(
    "events_lorenz_curve",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    deciled AS (
      SELECT cents,
             ntile(10) OVER (ORDER BY cents, user_id) AS decile
      FROM per_user
    ),
    g AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(cents) AS BIGINT) AS decile_cents
      FROM deciled GROUP BY decile
    ),
    tot AS (SELECT CAST(sum(decile_cents) AS BIGINT) AS t FROM g)
    SELECT g.decile, g.n_users, g.decile_cents,
           CAST(sum(g.decile_cents) OVER (ORDER BY g.decile) * 1000000
                  // tot.t AS BIGINT) AS cum_share_micro
    FROM g, tot
    """,
)
def events_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE of user spend — the 10-point cumulative-share
    curve behind every "top X% of users drive Y% of revenue" claim,
    and the graphical partner of the Gini/Theil inequality family
    (corpus_gini_lengths prices length skew; this prices revenue
    concentration). Users sort into spend deciles (ntile over the
    deterministic (cents, user_id) total order, identical in both
    engines) and each row carries the decile mass plus the running
    share in exact integer micro units — the final row is 1000000 by
    construction, and curvature away from the diagonal IS the
    inequality.

    Scale shape: one map-side-combinable per-user rollup, one
    ntile window over users (single ORDER BY exchange — at 100 TB
    swap for the percentile_exact histogram-rank form the equal-freq
    bucketer already ships), then O(10) rows."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    deciled = per_user.select(
        "cents",
        F.ntile(10).over(W.orderBy("cents", "user_id")).alias("decile"),
    )
    g = deciled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("decile_cents"),
    )
    tot = g.agg(F.sum("decile_cents").cast("bigint").alias("t"))
    return g.join(F.broadcast(tot)).select(
        "decile",
        "n_users",
        "decile_cents",
        F.expr("sum(decile_cents) over (order by decile) * 1000000 div t")
        .cast("bigint")
        .alias("cum_share_micro"),
    )


@register(
    "agg_anova_weekday_effect",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
             CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss
      FROM daily GROUP BY dow
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(ss) AS BIGINT) AS sst,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    f AS (
      SELECT t.nn, t.k,
             sum(CAST(g.s AS DOUBLE) * g.s / g.n)
               - CAST(t.st AS DOUBLE) * t.st / t.nn AS ssb,
             CAST(t.sst AS DOUBLE)
               - sum(CAST(g.s AS DOUBLE) * g.s / g.n) AS ssw
      FROM g, tot t GROUP BY t.nn, t.k, t.st, t.sst
    )
    SELECT nn AS n_days, k AS n_groups,
           CAST(floor(ssb) AS BIGINT) AS ssb_floor,
           CAST(floor(ssw) AS BIGINT) AS ssw_floor,
           CAST(floor((ssb / (k - 1)) / (ssw / (nn - k)) * 1000)
             AS BIGINT) AS f_stat_milli,
           CAST(CASE WHEN (ssb / (k - 1)) / (ssw / (nn - k)) > 2.51
                     THEN 1 ELSE 0 END AS INTEGER) AS weekday_effect_95
    FROM f
    """,
)
def agg_anova_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA for a WEEKDAY EFFECT on daily revenue — the
    calendar-seasonality gate: group the daily totals by day-of-week
    and test whether between-group variance exceeds within-group
    (F = (SSB/(k-1)) / (SSW/(n-k)); the 2.51 critical value is
    F(6, 20+) at 95% — conservative for the df here). A real weekday
    effect means every drift detector upstream (KS, CUSUM, PSI,
    rate-shift) must compare LIKE days or it will alarm every Monday.
    Same closed-form-over-exact-sums discipline as agg_welch_ttest:
    exact BIGINT cent sums per group, a handful of final double
    expressions, bit-stable across engines and partitionings.

    Scale shape: one (day, dow) rollup over events, a 7-row group
    aggregate, a 1-row cross join. O(1) after the first exchange."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_idx"),
        F.dayofweek(F.col("ts").cast("date")).cast("long").alias("dow"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    g = daily.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("st"),
        F.sum("ss").cast("bigint").alias("sst"),
        F.count("*").cast("bigint").alias("k"),
    )
    j = g.join(F.broadcast(tot))
    f = j.groupBy("nn", "k", "st", "sst").agg(
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
            "sgs"
        )
    )
    ssb = F.col("sgs") - F.col("st").cast("double") * F.col("st") / F.col("nn")
    ssw = F.col("sst").cast("double") - F.col("sgs")
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k")))
    return f.select(
        F.col("nn").alias("n_days"),
        F.col("k").alias("n_groups"),
        F.floor(ssb).cast("bigint").alias("ssb_floor"),
        F.floor(ssw).cast("bigint").alias("ssw_floor"),
        F.floor(fstat * 1000).cast("bigint").alias("f_stat_milli"),
        F.when(fstat > 2.51, 1).otherwise(0).cast("int").alias(
            "weekday_effect_95"
        ),
    )
