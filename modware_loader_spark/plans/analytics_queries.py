"""Analytics surface beyond the reference (SURVEY §2.7 notes the reference
has no window aggregates beyond row_number, no grouping sets/rollup/cube):
as a general-purpose engine these come free from Spark SQL — each with a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modware_loader_spark.operators.merge import closure_refresh_delete
from modware_loader_spark.plans.registry import query
from modware_loader_spark.session import load_tables

__all__: list[str] = []


@query(
    "agg_rollup_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)::DOUBLE AS total
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one pass (partial-agg friendly)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("total"),
    )


@query(
    "agg_cube_returnflag_linestatus",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_items,
           round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one shuffle."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("qty"),
    )


@query(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE
             AS running_total,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS order_seq
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates (beyond the reference's row_number-only window
    surface): exact decimal running sum, totally ordered."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        )
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "m7_closure_refresh_delete",
    """
    SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem s
      WHERE s.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND s.l_orderkey = lineitem.l_orderkey
        AND s.l_linenumber = lineitem.l_linenumber
        AND s.l_partkey = lineitem.l_partkey)
    """,
)
def m7_closure_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 correlated EXISTS + EXCEPT delete set
    (``share/postgresql_transitive.lib:50-78``): live rows whose natural-key
    projection is absent from staging."""
    t = load_tables(spark, sf_dir)
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    live = t["lineitem"].select(*cols)
    staging_proj = t["lineitem"].filter(F.col("l_shipdate") >= "1996-01-01").select(*cols)
    return closure_refresh_delete(live, staging_proj)
