"""Deterministic graph builders over the driver's parquet testdata.

Two graphs, both pure functions of the TPC-H-ish tables so every Cypher
query on them has an exact DuckDB-SQL oracle on the same parquet:

- ``tpch_graph``: the star schema as a heterogeneous property graph
  (Customer-[:IN_NATION]->Nation-[:IN_REGION]->Region, orders, lineitems).
- ``knows_graph``: the reference's Person/KNOWS ring+chord correctness
  fixture (FIXTURES.md F1, reference benches/query_ops.rs:22-60) with
  vertex count = |customer|, derived from ``customer`` arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rust_graph_db_spark.model import PropertyGraph

CITIES = ["NYC", "LA", "Chicago", "Houston", "Phoenix"]


def tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    read = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
    region, nation = read("region"), read("nation")
    customer, supplier = read("customer"), read("supplier")
    part, orders, lineitem = read("part"), read("orders"), read("lineitem")

    g = PropertyGraph(spark, name="tpch")
    g.put_vertices("Region", region.select(F.col("r_regionkey").cast("long").alias("key"),
                                           F.col("r_name").alias("name")), locid_col="key")
    g.put_vertices("Nation", nation.select(F.col("n_nationkey").cast("long").alias("key"),
                                           F.col("n_name").alias("name"),
                                           F.col("n_regionkey").cast("long").alias("regionkey")),
                   locid_col="key")
    g.put_vertices("Customer", customer.select(F.col("c_custkey").alias("key"),
                                               F.col("c_name").alias("name"),
                                               F.col("c_acctbal").alias("acctbal"),
                                               F.col("c_mktsegment").alias("mktsegment")),
                   locid_col="key")
    g.put_vertices("Supplier", supplier.select(F.col("s_suppkey").alias("key"),
                                               F.col("s_name").alias("name"),
                                               F.col("s_acctbal").alias("acctbal")),
                   locid_col="key")
    g.put_vertices("Part", part.select(F.col("p_partkey").alias("key"),
                                       F.col("p_name").alias("name"),
                                       F.col("p_brand").alias("brand"),
                                       F.col("p_type").alias("type"),
                                       F.col("p_size").alias("size"),
                                       F.col("p_retailprice").alias("retailprice")),
                   locid_col="key")
    g.put_vertices("Order", orders.select(F.col("o_orderkey").alias("key"),
                                          F.col("o_orderstatus").alias("status"),
                                          F.col("o_totalprice").alias("totalprice"),
                                          F.col("o_orderpriority").alias("priority")),
                   locid_col="key")

    nat_id = g.label_id("Nation")
    reg_id = g.label_id("Region")
    cust_id = g.label_id("Customer")
    supp_id = g.label_id("Supplier")
    part_id = g.label_id("Part")
    ord_id = g.label_id("Order")

    from rust_graph_db_spark.model import pack_graphid

    g.put_edges("IN_REGION",
                nation.select(pack_graphid(nat_id, F.col("n_nationkey")).alias("src"),
                              pack_graphid(reg_id, F.col("n_regionkey")).alias("dst"),
                              F.col("n_nationkey").cast("long").alias("k")),
                locid_col="k")
    g.put_edges("IN_NATION",
                customer.select(pack_graphid(cust_id, F.col("c_custkey")).alias("src"),
                                pack_graphid(nat_id, F.col("c_nationkey")).alias("dst"),
                                F.col("c_custkey").alias("k")),
                locid_col="k")
    g.put_edges("SUPP_NATION",
                supplier.select(pack_graphid(supp_id, F.col("s_suppkey")).alias("src"),
                                pack_graphid(nat_id, F.col("s_nationkey")).alias("dst"),
                                F.col("s_suppkey").alias("k")),
                locid_col="k")
    g.put_edges("PLACED",
                orders.select(pack_graphid(cust_id, F.col("o_custkey")).alias("src"),
                              pack_graphid(ord_id, F.col("o_orderkey")).alias("dst"),
                              F.col("o_orderkey").alias("k"),
                              F.col("o_totalprice").alias("totalprice")),
                locid_col="k")
    # One edge per lineitem; linenumber is 1..7 so orderkey*8+linenumber is unique.
    g.put_edges("HAS_ITEM",
                lineitem.select(pack_graphid(ord_id, F.col("l_orderkey")).alias("src"),
                                pack_graphid(part_id, F.col("l_partkey")).alias("dst"),
                                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
                                F.col("l_quantity").alias("quantity"),
                                F.col("l_extendedprice").alias("extendedprice"),
                                F.col("l_discount").alias("discount"),
                                F.col("l_returnflag").alias("returnflag")),
                locid_col="k")
    g.put_edges("SUPPLIED_BY",
                lineitem.select(pack_graphid(part_id, F.col("l_partkey")).alias("src"),
                                pack_graphid(supp_id, F.col("l_suppkey")).alias("dst"),
                                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k")),
                locid_col="k")
    return g


def knows_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Person/KNOWS ring+chord fixture (F1), |V| = |customer|.

    Topology (keys are 0-based): ``k -> (k + 1) % N`` for every person,
    plus chord ``k -> (k + 5) % N`` when ``k % 10 == 0``. Properties follow the
    reference bench generator (name/age/city/active/email).
    Everything is arithmetic over ``c_custkey``, so a DuckDB oracle can
    rebuild the identical graph with a CTE (see oracle_views.KNOWS_SQL).
    """
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = customer.count()  # tiny action at build time; N is a structural constant

    person = customer.select(
        F.col("c_custkey").alias("key"),
        F.concat(F.lit("Person"), F.col("c_custkey")).alias("name"),
        (F.lit(20) + F.col("c_custkey") % 60).cast("long").alias("age"),
        F.element_at(F.array(*[F.lit(c) for c in CITIES]),
                     (F.col("c_custkey") % 5 + 1).cast("int")).alias("city"),
        (F.col("c_custkey") % 2 == 0).alias("active"),
        F.when(F.col("c_custkey") % 2 == 0,
               F.concat(F.lit("p"), F.col("c_custkey"), F.lit("@example.com"))).alias("email"),
    )

    g = PropertyGraph(spark, name="knows")
    g.put_vertices("Person", person, locid_col="key")
    pid = g.label_id("Person")

    from rust_graph_db_spark.model import pack_graphid

    base = customer.select(F.col("c_custkey").alias("k"))
    ring = base.select(
        F.col("k"),
        ((F.col("k") + 1) % n).alias("dk"),
        (F.col("k") * 2).alias("eid"),
    )
    chords = base.where(F.col("k") % 10 == 0).select(
        F.col("k"),
        ((F.col("k") + 5) % n).alias("dk"),
        (F.col("k") * 2 + 1).alias("eid"),
    )
    knows = ring.unionByName(chords).select(
        pack_graphid(pid, F.col("k")).alias("src"),
        pack_graphid(pid, F.col("dk")).alias("dst"),
        F.col("eid"),
        (F.lit(2020) + F.col("k") % 5).cast("long").alias("since"),
        F.lit(1.0).alias("weight"),
    )
    g.put_edges("KNOWS", knows, locid_col="eid")
    return g


# DuckDB CTE bodies that mirror knows_graph exactly — prepend to oracle SQL.
KNOWS_PERSON_CTE = """
person AS (
  SELECT c_custkey AS key,
         'Person' || c_custkey AS name,
         CAST(20 + c_custkey % 60 AS BIGINT) AS age,
         CASE CAST(c_custkey % 5 AS INT)
           WHEN 0 THEN 'NYC' WHEN 1 THEN 'LA' WHEN 2 THEN 'Chicago'
           WHEN 3 THEN 'Houston' ELSE 'Phoenix' END AS city,
         (c_custkey % 2 = 0) AS active,
         CASE WHEN c_custkey % 2 = 0 THEN 'p' || c_custkey || '@example.com' END AS email
  FROM customer
)"""

KNOWS_EDGE_CTE = """
knows AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT count(*) FROM customer) AS dst,
         CAST(2020 + c_custkey % 5 AS BIGINT) AS since, 1.0 AS weight
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 5) % (SELECT count(*) FROM customer),
         CAST(2020 + c_custkey % 5 AS BIGINT), 1.0
  FROM customer WHERE c_custkey % 10 = 0
)"""
