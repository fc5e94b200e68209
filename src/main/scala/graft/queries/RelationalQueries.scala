package graft.queries

import graft.model.EventLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The engine's full relational surface (SURVEY §2.9: the reference has no
 * joins of its own, but the engine ships Spark's complete join/agg algebra
 * for enrichment and the pipeline extensions). Exercised on the TPC-H-ish
 * star schema. Dimension sides are broadcast — no shuffle of the fact table
 * beyond its aggregation keys.
 */
object RelationalQueries extends QueryGroup {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1-shaped pricing summary: single scan, partial aggregation. */
  private val q1 = QueryDef(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") <= expr("TIMESTAMP '2001-09-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** TPC-H Q3-shaped shipping priority: two broadcast joins into the fact. */
  private val q3 = QueryDef(
    (s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < expr("TIMESTAMP '1998-06-01 00:00:00'"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > expr("TIMESTAMP '1998-06-01 00:00:00'"))
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("o_orderkey"), unix_millis(col("o_orderdate")).as("o_orderdate_ms"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    },
    Some("""SELECT o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin))

  /** Semi/anti join surface: customers with vs without orders. */
  private val j1 = QueryDef(
    (s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders").select(col("o_custkey"))
      val withOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("with_orders"))
      val withoutOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("without_orders"))
      withOrders.crossJoin(withoutOrders)
    },
    Some("""SELECT
      |  (SELECT count(*) FROM customer WHERE EXISTS
      |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
      |  (SELECT count(*) FROM customer WHERE NOT EXISTS
      |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders""".stripMargin))

  /** Stream-static enrichment (§2.9: TableView/state lookup inside a
   * Function): events enriched against the customer dimension by key. */
  private val j2 = QueryDef(
    (s, d) => {
      val e = EventLog.topic(s, d)
      val cust = t(s, d, "customer")
      e.join(broadcast(cust), col("key").cast("long") + 1 === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""${EventLog.oracleCte}
      |SELECT c_mktsegment, count(*) AS n, round(sum(env.value), 2) AS sum_v
      |FROM env JOIN customer ON CAST(env.key AS BIGINT) + 1 = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Top-k with deterministic tie-break. */
  private val j3 = QueryDef(
    (s, d) => t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n_orders"))
      .orderBy(col("total").desc, col("o_custkey")).limit(10),
    Some("""SELECT o_custkey, round(sum(o_totalprice), 2) AS total, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY total DESC, o_custkey LIMIT 10""".stripMargin))

  override val defs: Map[String, QueryDef] = Map(
    "q1_pricing_summary" -> q1,
    "q3_shipping_priority" -> q3,
    "j1_semi_anti_orders" -> j1,
    "j2_enrich_events" -> j2,
    "j3_topk_customers" -> j3
  )
}
