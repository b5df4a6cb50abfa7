package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import graft.functions.Canon
import org.apache.spark.sql.functions._

/** Analytic window functions (SURVEY §2.6) + top-K / sampling (§2.7).
  *
  * No OVER clause exists in the reference; these replace its per-camera
  * pandas loops (vehicle_counting_app.py:131-146) and recency queries
  * (fire_detection_app.py:43-44). All orderings are tie-broken on key
  * columns so results are deterministic across engines.
  *
  * Scale notes: Window.partitionBy shuffles once on the partition key and
  * sorts within partitions — no global sort. Top-K via orderBy+limit plans
  * `TakeOrderedAndProject` (per-partition heaps, no full sort). The
  * "sample" is hash-modulo based, not rand(): deterministic, pushdown-able,
  * and reproducible on any cluster size.
  */
object WindowQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q40_window_rank",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t.orders
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
                  round(col("o_totalprice"), 2).as("price"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |        ROW_NUMBER() OVER (PARTITION BY o_custkey
             |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 3""".stripMargin),
      "§2.6: row_number top-3 per customer (replaces vehicle_counting_app.py:131-146 loops)"),

    GraftQuery(
      "q41_window_lag",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        t.lineitem
          .withColumn("prev_ship", lag(col("l_shipdate"), 1).over(w))
          .withColumn("gap_days",
            datediff(col("l_shipdate").cast("date"), col("prev_ship").cast("date")))
          .groupBy("l_suppkey")
          .agg(count(col("gap_days")).as("n_gaps"),
               Canon.avgExactC2(col("gap_days")).as("avg_gap_c2"),
               max(col("gap_days")).as("max_gap_days"))
      },
      Some("""SELECT l_suppkey, count(gap_days) AS n_gaps,
             |  CAST(floor(avg(gap_days) * 100 + 0.5) AS BIGINT) AS avg_gap_c2,
             |  max(gap_days) AS max_gap_days
             |FROM (SELECT l_suppkey,
             |        date_diff('day',
             |          LAG(l_shipdate) OVER (PARTITION BY l_suppkey
             |            ORDER BY l_shipdate, l_orderkey, l_linenumber)::DATE,
             |          l_shipdate::DATE) AS gap_days
             |      FROM lineitem)
             |GROUP BY l_suppkey""".stripMargin),
      "§2.6: lag frame-to-frame deltas, shipment gaps per supplier"),

    GraftQuery(
      "q42_window_running",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.orders
          .filter(col("o_custkey") % 10 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
                  round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
             |FROM orders WHERE o_custkey % 10 = 0""".stripMargin),
      "§2.6: running sum rowsBetween frame"),

    GraftQuery(
      "q43_window_ntile_dense",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Unpartitioned window = ONE partition holds the whole input —
        // acceptable ONLY because supplier is a dimension table (stays
        // dim-sized at any fact scale). A global ntile over a fact
        // would instead go through q44's TakeOrderedAndProject shape or
        // a two-pass range-partitioned rank.
        val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
        t.supplier
          .select(col("s_suppkey"),
                  dense_rank().over(w).as("bal_rank"),
                  ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT s_suppkey,
             |  DENSE_RANK() OVER w AS bal_rank, NTILE(4) OVER w AS quartile
             |FROM supplier
             |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)""".stripMargin),
      "§2.6: dense_rank + ntile quartiles (global window on small dim)"),

    GraftQuery(
      "q44_topk",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // O1: ORDER BY … DESC LIMIT n — TakeOrderedAndProject, no full sort.
        t.lineitem
          .groupBy("l_partkey")
          .agg(sum(Canon.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
               count(lit(1)).as("n_lines"))
          .orderBy(col("revenue_cents").desc, col("l_partkey").asc)
          .limit(10)
      },
      Some("""SELECT l_partkey,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |  count(*) AS n_lines
             |FROM lineitem GROUP BY l_partkey
             |ORDER BY revenue_cents DESC, l_partkey LIMIT 10""".stripMargin),
      "O1: top-K by aggregate (vehicle_counting_app.py:46-47)"),

    GraftQuery(
      "q45_sample",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // O2: the reference samples via ORDER BY RANDOM() LIMIT 300
        // (streamlit_app.py:42). Engine-side deterministic equivalent:
        // key-modulo sampling — reproducible across engines and cluster
        // sizes, and pushdown-able (rand() is neither).
        t.orders
          .filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
                  round(col("o_totalprice"), 2).as("price"))
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
             |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin),
      "O2: deterministic key-modulo sample (streamlit_app.py:42 recast)"),

    GraftQuery(
      "q46_sort_global",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // O4: global sort = range-partitioned exchange; bounded output.
        t.supplier
          .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
          .select(col("s_suppkey"), col("s_name"),
                  round(col("s_acctbal"), 2).as("bal"))
      },
      Some("""SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal
             |FROM supplier ORDER BY s_acctbal DESC, s_suppkey""".stripMargin),
      "O4: global sort via range exchange (small dim; driver compare is order-insensitive)"))
}
