package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.functions.Canon
import org.apache.spark.sql.functions._

/** Set operations (SURVEY §2.8): union/unionByName, intersect, except,
  * distinct/dropDuplicates.
  *
  * The reference's closest analogue is two camera producer threads writing
  * one topic (video_producer.py:143-152) — a physical union. intersect /
  * except plan as left-semi / left-anti under Catalyst; distinct is a
  * hash aggregation on all columns.
  */
object SetOpQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q50_union",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Merge two "camera" streams (high-value vs error events) then
        // re-aggregate — unionByName resolves by column name, not position.
        val purchases = t.events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("value"), lit("cam_purchase").as("origin"))
        val errors = t.events.filter(col("event_type") === "error")
          .select(lit("cam_error").as("origin"), col("user_id"), col("value"))
        purchases.unionByName(errors)
          .groupBy("origin")
          .agg(count(lit(1)).as("n"), Canon.sumCents(col("value")).as("sum_value_cents"))
      },
      Some("""SELECT origin, count(*) AS n,
             |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
             |FROM (
             |  SELECT user_id, value, 'cam_purchase' AS origin FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, value, 'cam_error' AS origin FROM events WHERE event_type = 'error')
             |GROUP BY origin""".stripMargin),
      "§2.8: unionByName of two event streams (video_producer.py:143-152 shape)"),

    GraftQuery(
      "q51_intersect_except",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // One distributed plan, one action: each set-op branch reduces to
        // a 1-row count and the three 1-row frames cross-join — no
        // driver-side .count() assembly (the three branches still plan as
        // real INTERSECT/EXCEPT/UNION-distinct physical operators).
        val custKeys = t.customer.select(col("c_custkey").as("k"))
        val orderCust = t.orders.select(col("o_custkey").as("k"))
        custKeys.intersect(orderCust).agg(count(lit(1)).as("n_both"))
          .crossJoin(broadcast(
            custKeys.except(orderCust).agg(count(lit(1)).as("n_no_orders"))))
          .crossJoin(broadcast(
            custKeys.union(orderCust).distinct().agg(count(lit(1)).as("n_all_keys"))))
      },
      Some("""SELECT
             |  (SELECT count(*) FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)) AS n_both,
             |  (SELECT count(*) FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)) AS n_no_orders,
             |  (SELECT count(*) FROM (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders)) AS n_all_keys""".stripMargin),
      "§2.8: intersect (left-semi) + except (left-anti) + union-distinct"),

    GraftQuery(
      "q52_distinct",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders.select("o_custkey", "o_orderstatus").distinct()
      },
      Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders"),
      "§2.8: dropDuplicates/distinct as hash agg on all columns"))
}
