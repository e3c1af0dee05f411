"""Spatial grid join: distance-bounded point pairs without a cross
join.

Synthetic integer coordinates are derived deterministically from md5
(the established cross-engine idiom) on a 10000x10000 planar grid, so
squared Euclidean distances are exact integer arithmetic — no floating
point disagreement between engines.

The join shape is the classic spatial-grid bucketing: bucket every
point into cells of side R, expand ONE side to its 3x3 neighbor cells,
equi-join on the cell key, and apply the exact distance predicate to
candidates only. At 100 TB this replaces an O(n*m) cross join with a
shuffle on cell keys whose candidate volume is ~(point density x 9R^2)
per point — the same blocking trick LSH uses for near-dup, applied to
geometry. Each (customer, supplier) pair is generated at most once
because a supplier's cell is unique and the customer's 9 expanded
cells are distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.operators.sketches import _hex_int_sql
from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table

_GRID = 10000  # coordinate space [0, _GRID)
_R = 150  # radius; also the grid cell side


def _coord(prefix: str, key: str):
    h = F.md5(F.concat(F.lit(prefix), F.col(key).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _GRID


def _coord_sql(prefix: str, key: str) -> str:
    h = f"md5('{prefix}' || CAST({key} AS VARCHAR))"
    return f"CAST({_hex_int_sql(h, 1)} AS BIGINT) % {_GRID}"


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             {_coord_sql('cx', 'c_custkey')} AS cx,
             {_coord_sql('cy', 'c_custkey')} AS cy
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             {_coord_sql('sx', 's_suppkey')} AS sx,
             {_coord_sql('sy', 's_suppkey')} AS sy
      FROM supplier
    ),
    cexp AS (
      SELECT c.*, (cx // {_R}) + dx.v AS gx, (cy // {_R}) + dy.v AS gy
      FROM c
      CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
      CROSS JOIN (VALUES (-1), (0), (1)) dy(v)
    ),
    cand AS (
      SELECT cexp.c_custkey, cexp.c_nationkey,
             (cexp.cx - s.sx) * (cexp.cx - s.sx)
             + (cexp.cy - s.sy) * (cexp.cy - s.sy) AS dist2
      FROM cexp
      JOIN s ON s.sx // {_R} = cexp.gx AND s.sy // {_R} = cexp.gy
    )
    SELECT c_nationkey,
           count(*) AS n_pairs,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(min(dist2) AS BIGINT) AS min_dist2
    FROM cand
    WHERE dist2 <= {_R * _R}
    GROUP BY c_nationkey
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-supplier pairs within planar distance R via grid-cell
    blocking + exact integer distance verify, aggregated per customer
    nation. No broadcast hint: at scale both sides shuffle on the cell
    key and AQE picks the strategy; the 9x expansion rides the same
    exchange."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        _coord("cx", "c_custkey").alias("cx"),
        _coord("cy", "c_custkey").alias("cy"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("sx", "s_suppkey").alias("sx"),
        _coord("sy", "s_suppkey").alias("sy"),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    cexp = cust.withColumn("dx", F.explode(off)).withColumn("dy", F.explode(off))
    cexp = cexp.select(
        "c_custkey",
        "c_nationkey",
        "cx",
        "cy",
        (F.expr(f"cx div {_R}") + F.col("dx")).alias("gx"),
        (F.expr(f"cy div {_R}") + F.col("dy")).alias("gy"),
    )
    sg = sup.select(
        "s_suppkey",
        "sx",
        "sy",
        F.expr(f"sx div {_R}").alias("sgx"),
        F.expr(f"sy div {_R}").alias("sgy"),
    )
    cand = cexp.join(
        sg, (F.col("gx") == F.col("sgx")) & (F.col("gy") == F.col("sgy"))
    ).select(
        "c_custkey",
        "c_nationkey",
        (
            (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
            + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
        ).alias("dist2"),
    )
    return (
        cand.filter(F.col("dist2") <= _R * _R)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.min("dist2").alias("min_dist2"),
        )
    )


_KNN_K = 3
_KNN_RMAX = 300  # bounded search radius = 2 grid rings


@register(
    "spatial_knn_grid",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_sql('cx', 'c_custkey')} AS cx,
             {_coord_sql('cy', 'c_custkey')} AS cy
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             {_coord_sql('sx', 's_suppkey')} AS sx,
             {_coord_sql('sy', 's_suppkey')} AS sy
      FROM supplier
    ),
    cexp AS (
      SELECT c.*, (cx // {_R}) + dx.v AS gx, (cy // {_R}) + dy.v AS gy
      FROM c
      CROSS JOIN (VALUES (-2), (-1), (0), (1), (2)) dx(v)
      CROSS JOIN (VALUES (-2), (-1), (0), (1), (2)) dy(v)
    ),
    cand AS (
      SELECT cexp.c_custkey, s.s_suppkey,
             (cexp.cx - s.sx) * (cexp.cx - s.sx)
             + (cexp.cy - s.sy) * (cexp.cy - s.sy) AS dist2
      FROM cexp
      JOIN s ON s.sx // {_R} = cexp.gx AND s.sy // {_R} = cexp.gy
    ),
    ranked AS (
      SELECT c_custkey, s_suppkey, CAST(dist2 AS BIGINT) AS dist2,
             row_number() OVER (
               PARTITION BY c_custkey
               ORDER BY dist2 ASC, s_suppkey ASC) AS rk
      FROM cand WHERE dist2 <= {_KNN_RMAX * _KNN_RMAX}
    )
    SELECT c_custkey, CAST(rk AS BIGINT) AS rk, s_suppkey, dist2
    FROM ranked WHERE rk <= {_KNN_K}
    """,
)
def spatial_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-RADIUS K-NEAREST-NEIGHBOR via grid blocking — the
    production spatial-KNN shape ('nearest {_KNN_K} depots within
    {_KNN_RMAX} units'; an unbounded exact KNN needs data-dependent
    ring expansion, so real systems bound the search radius and call
    farther matches no-service): customers expand to the 5x5 cell
    neighborhood that fully covers the {_KNN_RMAX}-radius disk
    (cells of side {_R}, so 2 rings suffice — no candidate inside the
    radius can be missed), suppliers join on the cell key, the exact
    integer distance predicate prunes, and a per-customer rank keeps
    the {_KNN_K} nearest (ties to the lowest supplier key).

    Scale shape: the same cell-key equi-join as join_spatial_grid —
    never a cross join — with candidate volume ~density x 25R^2 per
    point; the rank filter compiles to a map-side WindowGroupLimit so
    each partition forwards at most {_KNN_K} candidates per customer.
    All-integer coordinates and distances: engines agree bit-for-bit."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("cx", "c_custkey").alias("cx"),
        _coord("cy", "c_custkey").alias("cy"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("sx", "s_suppkey").alias("sx"),
        _coord("sy", "s_suppkey").alias("sy"),
    )
    off = F.array(*[F.lit(v) for v in (-2, -1, 0, 1, 2)])
    cexp = (
        cust.withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "c_custkey",
            "cx",
            "cy",
            (F.expr(f"cx div {_R}") + F.col("dx")).alias("gx"),
            (F.expr(f"cy div {_R}") + F.col("dy")).alias("gy"),
        )
    )
    sg = sup.select(
        "s_suppkey",
        "sx",
        "sy",
        F.expr(f"sx div {_R}").alias("sgx"),
        F.expr(f"sy div {_R}").alias("sgy"),
    )
    dist2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    cand = (
        cexp.join(sg, (F.col("gx") == F.col("sgx")) & (F.col("gy") == F.col("sgy")))
        .select("c_custkey", "s_suppkey", dist2.alias("dist2"))
        .filter(F.col("dist2") <= _KNN_RMAX * _KNN_RMAX)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("c_custkey").orderBy(
        F.col("dist2").asc(), F.col("s_suppkey").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
        .select(
            "c_custkey",
            F.col("rk").cast("bigint").alias("rk"),
            "s_suppkey",
            F.col("dist2").cast("bigint").alias("dist2"),
        )
    )
