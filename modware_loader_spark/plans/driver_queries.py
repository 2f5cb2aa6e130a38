"""Driver-facing query registry: every implemented operator from
SURVEY.md §2, expressed over the driver's synthetic star schema
(region nation customer supplier part orders lineitem events documents
embeddings) with a DuckDB oracle for the correctness gate.

Each entry maps an operator of the reference onto the synthetic tables:
the *pattern* (anti-join merge, SCD-1 update, windowed dedup, …) is the
thing under test; the tables are stand-ins for Chado staging/live
relations. Reference citations live in the operator library
(``modware_loader_spark.operators``) that these queries call.

Determinism rules (so Spark and DuckDB hash-match):
- money aggregates go through exact decimal arithmetic then ``round(x, 2)``
  and a double cast → accumulation-order independent;
- every window/row_number has a total order (ties broken by keys);
- timestamps are compared/bucketed, never returned raw (returned as dates
  or strings);
- hashing is md5-based 60-bit ints (identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modware_loader_spark.operators import merge as M
from modware_loader_spark.plans.registry import ORACLES, QUERIES, money, query
from modware_loader_spark.session import load_tables

__all__ = ["QUERIES", "ORACLES"]


# ---------------------------------------------------------------------------
# Headline queries (bench + flagship) — classic scan→filter→agg / multi-join
# shapes. These are the plans whose physical strategy matters most at 100 TB:
# filters push to parquet, dims broadcast, single shuffle on the agg keys.
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE AS sum_qty,
           round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)::DOUBLE AS sum_base_price,
           round(sum(CAST(l_extendedprice AS DECIMAL(38,6)) * (1 - CAST(l_discount AS DECIMAL(38,6)))), 2)::DOUBLE AS sum_disc_price,
           round(sum(CAST(l_extendedprice AS DECIMAL(38,6)) * (1 - CAST(l_discount AS DECIMAL(38,6))) * (1 + CAST(l_tax AS DECIMAL(38,6)))), 2)::DOUBLE AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan, pushed filter, one shuffle on 2 keys."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= "1998-09-02")
    price = F.col("l_extendedprice").cast("decimal(38,6)")
    disc = F.col("l_discount").cast("decimal(38,6)")
    tax = F.col("l_tax").cast("decimal(38,6)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money(F.col("l_quantity")).alias("sum_qty"),
        money(F.col("l_extendedprice")).alias("sum_base_price"),
        F.round(F.sum(price * (1 - disc)), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(price * (1 - disc) * (1 + tax)), 2).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_top_revenue_orders",
    """
    SELECT o.o_orderkey,
           round(sum(CAST(l.l_extendedprice AS DECIMAL(38,6)) * (1 - CAST(l.l_discount AS DECIMAL(38,6)))), 2)::DOUBLE AS revenue,
           CAST(o.o_orderdate AS DATE)::VARCHAR AS orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 20
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-N.

    customer is broadcast (dim-sized); lineitem↔orders shuffle once on the
    order key; the global top-20 is a TakeOrderedAndProject, not a full sort.
    """
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderstatus") != "F")
    li = t["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(38,6)")
    disc = F.col("l_discount").cast("decimal(38,6)")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(price * (1 - disc)), 2).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(20)
    )


@query(
    "q5_region_revenue",
    """
    SELECT r.r_name, n.n_name,
           round(sum(CAST(l.l_extendedprice AS DECIMAL(38,6)) * (1 - CAST(l.l_discount AS DECIMAL(38,6)))), 2)::DOUBLE AS revenue,
           count(*) AS n_items
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape / reference E5 hierarchy descent: 5-level join
    region→nation→customer→orders→lineitem, the Spark replacement for the
    reference's per-level event-emitter walk
    (``lib/Modware/EventEmitter/Feature/Chado.pm:71-130``). All three dims
    broadcast; the only shuffle is lineitem↔orders + the final 2-key agg."""
    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast("decimal(38,6)")
    disc = F.col("l_discount").cast("decimal(38,6)")
    dims = (
        t["customer"]
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(F.broadcast(dims), t["orders"].o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(price * (1 - disc)), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# M1-M14 — staging→live merge core (SURVEY §2.3). Staging relations are
# derived subsets of the synthetic tables; the merge pattern is the operator
# under test.
# ---------------------------------------------------------------------------


@query(
    "m1_new_keys_anti_join",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def m1_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 left-anti new-keys (``share/postgresql.lib:225-235``): customers
    with no urgent orders — staging rows whose key is absent from live."""
    t = load_tables(spark, sf_dir)
    live = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return M.new_keys(t["customer"], live, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "m2_existing_keys_semi_join",
    """
    SELECT DISTINCT o.o_custkey AS c_custkey, c.c_name, c.c_nationkey
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def m2_existing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 semi-join carrying live surrogate columns
    (``share/postgresql.lib:237-246``)."""
    t = load_tables(spark, sf_dir)
    staging = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return M.existing_keys(staging, t["customer"], ["c_custkey"], ["c_name", "c_nationkey"])


@query(
    "m3_scoped_prune_set",
    """
    SELECT p.p_partkey, p.p_brand
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48)
      AND p.p_brand IN (
        SELECT DISTINCT p2.p_brand FROM part p2
        JOIN lineitem l2 ON l2.l_partkey = p2.p_partkey
        WHERE l2.l_quantity >= 48)
    """,
)
def m3_scoped_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 scoped anti-diff (``share/postgresql.lib:248-260``): live parts
    absent from the staging file, restricted to the staging file's
    brand universe."""
    t = load_tables(spark, sf_dir)
    staging = (
        t["lineitem"]
        .filter(F.col("l_quantity") >= 48)
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand")
    )
    referenced = (
        t["lineitem"]
        .filter(F.col("l_quantity") >= 48)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    pruned = M.prune_set(
        t["part"].select("p_partkey", "p_brand"),
        referenced,
        ["p_partkey"],
    )
    scope = staging.select("p_brand").distinct()
    return pruned.join(F.broadcast(scope), ["p_brand"], "left_semi").select(
        "p_partkey", "p_brand"
    )


@query(
    "m4_delete_with_join",
    """
    SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    """,
)
def m4_delete_with_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 DELETE…USING (``share/postgresql.lib:311-318``): live minus the
    prune set, recomputed as an anti-join (Spark's delete)."""
    t = load_tables(spark, sf_dir)
    prune = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return M.delete_rows(t["orders"], prune, ["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )


@query(
    "m5_key_resolution_joins",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, s.s_name, n.n_name
    FROM lineitem l
    LEFT JOIN part p ON p.p_partkey = l.l_partkey
    LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l.l_quantity >= 49
    """,
)
def m5_key_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 N-way key-resolution joins (``share/postgresql.lib:195-219``):
    natural keys → surrogate values via chained broadcast dim joins."""
    t = load_tables(spark, sf_dir)
    fact = t["lineitem"].filter(F.col("l_quantity") >= 49).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    resolved = M.resolve_keys(
        fact,
        [
            (t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_name"), "l_partkey", "p_name"),
            (
                t["supplier"].select(
                    F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
                ).join(
                    t["nation"].select(F.col("n_nationkey").alias("s_nationkey"), "n_name"),
                    "s_nationkey",
                    "left",
                ).select("l_suppkey", F.struct("s_name", "n_name").alias("s_info")),
                "l_suppkey",
                "s_info",
            ),
        ],
    )
    return resolved.select(
        "l_orderkey",
        "l_linenumber",
        "p_name",
        F.col("s_info.s_name").alias("s_name"),
        F.col("s_info.n_name").alias("n_name"),
    )


@query(
    "m6_except_idempotent_insert",
    """
    SELECT DISTINCT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT DISTINCT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def m6_except_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 set-semantics EXCEPT before insert (``share/postgresql.lib:221-223``,
    Oracle MINUS ``WithOracle.pm:245-252``)."""
    t = load_tables(spark, sf_dir)
    cand = t["orders"].filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderpriority"
    )
    exist = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderpriority"
    )
    return M.except_insert(cand, exist)


@query(
    "m8_scd1_update_from_join",
    """
    SELECT c.c_custkey, c.c_name,
           round(coalesce(u.new_bal, CAST(c.c_acctbal AS DECIMAL(38,6))), 2)::DOUBLE AS c_acctbal
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, max(CAST(o_totalprice AS DECIMAL(38,6))) AS new_bal
      FROM orders GROUP BY o_custkey
    ) u ON u.o_custkey = c.c_custkey
    """,
)
def m8_scd1_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 UPDATE…FROM join / SCD-1 (``share/postgresql.lib:353-378``; Oracle
    MERGE ``WithOracle.pm:172-220``): overwrite c_acctbal where staging has
    a recomputed value, keep the old value elsewhere."""
    t = load_tables(spark, sf_dir)
    staging = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.max(F.col("o_totalprice").cast("decimal(38,6)")).alias("c_acctbal"))
    )
    live = t["customer"].select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("decimal(38,6)").alias("c_acctbal")
    )
    updated = M.scd1_update(live, staging, ["c_custkey"], ["c_acctbal"])
    return updated.select(
        "c_custkey", "c_name", F.round(F.col("c_acctbal"), 2).cast("double").alias("c_acctbal")
    )


@query(
    "m9_refresh_child_sets",
    """
    WITH staging AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
    WHERE l_orderkey NOT IN (SELECT l_orderkey FROM staging)
    UNION ALL
    SELECT * FROM staging
    """,
)
def m9_refresh_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 delete-then-reinsert child sets (``share/postgresql.lib:320-350``):
    parents present in staging get their whole child set replaced."""
    t = load_tables(spark, sf_dir)
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"]
    live = t["lineitem"].select(*cols)
    staging = t["lineitem"].filter(F.col("l_shipdate") >= "1998-01-01").select(*cols)
    return M.refresh_children(live, staging, ["l_orderkey"])


@query(
    "m10_grown_groups",
    """
    WITH lc AS (SELECT l_orderkey, count(*) AS live_count FROM lineitem
                WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY l_orderkey),
         sc AS (SELECT l_orderkey, count(*) AS staging_count FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' GROUP BY l_orderkey)
    SELECT sc.l_orderkey, lc.live_count, sc.staging_count
    FROM sc LEFT JOIN lc ON lc.l_orderkey = sc.l_orderkey
    WHERE coalesce(lc.live_count, 0) < sc.staging_count
    """,
)
def m10_grown_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 grouped-count comparison (``share/postgresql.lib:166-193``):
    orders whose post-1997 lineitem set outgrew the pre-1997 set."""
    t = load_tables(spark, sf_dir)
    live = t["lineitem"].filter(F.col("l_shipdate") < "1997-01-01")
    staging = t["lineitem"].filter(F.col("l_shipdate") >= "1997-01-01")
    return M.grown_groups(live, staging, "l_orderkey")


@query(
    "m11_window_dedup",
    """
    SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE)::VARCHAR AS shipdate
    FROM (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn = 1
    """,
)
def m11_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 dedup via row_number window (``share/postgresql_gff3.lib:175-187``):
    first shipment per part, total order so the pick is deterministic."""
    t = load_tables(spark, sf_dir)
    out = M.window_dedup(
        t["lineitem"].select("l_partkey", "l_orderkey", "l_linenumber", "l_shipdate"),
        ["l_partkey"],
        [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")],
    )
    return out.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").cast("string").alias("shipdate"),
    )


@query(
    "m12_distinct_insert",
    """
    SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem e
      WHERE e.l_returnflag = 'R' AND e.l_partkey = l.l_partkey AND e.l_suppkey = l.l_suppkey)
    """,
)
def m12_distinct_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12 DISTINCT + anti-join insert (``share/postgresql_gff3.lib:136-151``)."""
    t = load_tables(spark, sf_dir)
    staging = t["lineitem"].select("l_partkey", "l_suppkey")
    live = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_partkey", "l_suppkey")
    return M.distinct_insert(staging, live, ["l_partkey", "l_suppkey"])


@query(
    "m13_deterministic_id_generation",
    """
    SELECT c_custkey, c_name,
           'auto-' || row_number() OVER (ORDER BY c_custkey) AS generated_id
    FROM customer WHERE c_acctbal < 0
    """,
)
def m13_generate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13 deterministic sequence ids (vs ``nextval('feature_feature_id_seq')``,
    ``lib/Modware/Loader/GFF3/Staging/Postgresql.pm:28-56``): row_number over
    a canonical order, reproducible by the oracle."""
    t = load_tables(spark, sf_dir)
    neg = t["customer"].filter(F.col("c_acctbal") < 0).select("c_custkey", "c_name")
    return M.generate_ids(neg, ["c_custkey"], id_col="generated_id", prefix="auto-")


@query(
    "m14_versioned_dbxref",
    """
    SELECT c_custkey,
           'DSC_G' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS accession,
           1 AS version
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def m14_versioned_dbxref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14 versioned-dbxref plugin (``share/postgresql_transitive.lib:81-100``)
    + sprintf zero-pad id minting (``lib/Modware/Dump/Command/dictystrain.pm:40``):
    new keys get accession=zero-padded id, version=1."""
    t = load_tables(spark, sf_dir)
    live = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    fresh = M.new_keys(t["customer"].select("c_custkey"), live, ["c_custkey"])
    return fresh.select(
        "c_custkey",
        F.concat(F.lit("DSC_G"), F.lpad(F.col("c_custkey").cast("string"), 7, "0")).alias(
            "accession"
        ),
        F.lit(1).cast("int").alias("version"),
    )
