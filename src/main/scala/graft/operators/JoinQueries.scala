package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.functions.Canon
import org.apache.spark.sql.functions._

/** Join surface (SURVEY §2.4: J1–J5; J6/J7 live in streaming/similarity).
  *
  * The reference has no joins (every pipeline and dashboard statement is
  * single-table) — these are the tier-E relational closure over the star
  * schema.
  *
  * Scale strategy:
  *   - fact ⋈ fact (lineitem ⋈ orders): sort-merge on the shuffled key,
  *     AQE converts to broadcast when the filtered side fits;
  *   - fact ⋈ dim (nation/region/small part cuts): explicit `broadcast()`
  *     — a 25-row dim must never shuffle a 100 TB fact;
  *   - semi/anti instead of IN/NOT IN subqueries: no duplicate blowup and
  *     Catalyst plans them as one-sided joins (left side streams);
  *   - non-equi tier join: broadcast-nested-loop with a literal tier table
  *     — the only sane distributed plan for banded range predicates.
  */
object JoinQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q10_join_inner",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"), "inner")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_lines"),
               sum(Canon.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_lines,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus""".stripMargin),
      "J1: fact-fact equi inner join, sort-merge/AQE"),

    GraftQuery(
      "q11_join_broadcast",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_customers"),
               Canon.avgCents(col("c_acctbal")).as("avg_bal_cents"))
      },
      Some("""SELECT r_name, count(*) AS n_customers,
             |  CAST(floor(avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) + 0.5) AS BIGINT) AS avg_bal_cents
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin),
      "J2: snowflake dims broadcast (region/nation never shuffle the fact)"),

    GraftQuery(
      "q12_join_left_outer",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Left outer keeps order-less customers (count=0), then re-agg to a
        // histogram of customers per order count.
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .groupBy("n_orders")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT n_orders, count(*) AS n_customers FROM (
             |  SELECT c_custkey, count(o_orderkey) AS n_orders
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey)
             |GROUP BY n_orders""".stripMargin),
      "J3: left outer join + count histogram (TPC-H Q13 shape)"),

    GraftQuery(
      "q13_join_semi",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val bigLines = t.lineitem.filter(col("l_quantity") >= 45)
        t.orders
          .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
             |GROUP BY o_orderstatus""".stripMargin),
      "J4: left semi (EXISTS) — filter pushed below the join"),

    GraftQuery(
      "q14_join_anti",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY c_mktsegment""".stripMargin),
      "J4: left anti (NOT EXISTS) — customers with no orders"),

    GraftQuery(
      "q15_join_range",
      (spark, dir) => {
        val t = Tables(spark, dir)
        import spark.implicits._
        val tiers = Seq((1.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 51.0, "high"))
          .toDF("lo", "hi", "tier")
        t.lineitem
          .join(broadcast(tiers),
                col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n_lines"),
               round(sum(col("l_quantity")), 2).as("sum_qty"))
      },
      Some("""SELECT tier, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |JOIN (VALUES (1.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 51.0, 'high'))
             |  AS tiers(lo, hi, tier)
             |  ON l_quantity >= lo AND l_quantity < hi
             |GROUP BY tier""".stripMargin),
      "J5: non-equi banded range join — broadcast nested loop on literal tiers"),

    GraftQuery(
      "q16_join_multiway",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // 4-way star join: fact shuffles once per fact-fact edge; all dims
        // broadcast. Revenue per nation of the supplier.
        t.lineitem
          .join(t.orders.filter(col("o_orderstatus") =!= "P"),
                col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(Canon.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
               count(lit(1)).as("n_lines"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus <> 'P'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin),
      "J1+J2: multiway star join (TPC-H Q5 shape), dims broadcast"),

    GraftQuery(
      "q81_salted_skew_join",
      (spark, dir) => {
        val t = Tables(spark, dir)
        import spark.implicits._
        // events.event_type has 5 distinct values — the pathological
        // hot-key join: at 100 TB an unsalted shuffle join lands each
        // type's entire row mass on ONE reducer. Salting.saltedJoin
        // spreads every type across nSalts reducers; the weights dim
        // stands in for a per-key table too big to broadcast at scale
        // (the shuffle_hash hint inside saltedJoin keeps the demo
        // honest — broadcast would dissolve the skew by accident).
        val weights = Seq(
          ("click", 1.5), ("view", 1.0), ("purchase", 5.0),
          ("signup", 2.0), ("error", 0.0)).toDF("event_type", "weight")
        Salting.saltedJoin(t.events, weights, "event_type",
            nSalts = 8, saltFrom = Seq("event_id"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
               sum(Canon.cents(col("value") * col("weight"))).as("weighted_cents"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(floor(value * weight * 100 + 0.5) AS BIGINT)) AS BIGINT) AS weighted_cents
             |FROM events
             |JOIN (VALUES ('click', 1.5), ('view', 1.0), ('purchase', 5.0),
             |             ('signup', 2.0), ('error', 0.0))
             |  AS w(event_type, weight) USING (event_type)
             |GROUP BY event_type""".stripMargin),
      "skew toolkit: salted shuffle join on a 5-value hot key — result ≡ plain join, plan spreads each key over 8 reducers"),

    GraftQuery(
      "q82_runtime_filter_join",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Selective dim-side filter (one priority × one status) → Spark's
        // InjectRuntimeFilter seeds a bloom filter from the filtered
        // orders keys and applies it to the lineitem scan BEFORE the
        // shuffle — at 100 TB that is the difference between shuffling
        // the whole fact and shuffling the ~4 % that can match.
        // Correctness never depends on the filter (it only drops
        // non-matching rows early); PlanShapeSpec pins the injection.
        val urgent = t.orders.filter(
          col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
        t.lineitem
          .join(urgent, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_lines"),
               sum(Canon.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_lines,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
             |GROUP BY l_returnflag""".stripMargin),
      "runtime bloom-filter join: selective dim filter seeds a bloom pushed into the fact scan pre-shuffle (plan-pinned)"),

    GraftQuery(
      "q83_dpp_partitioned_join",
      (spark, dir) => {
        val t = Tables(spark, dir)
        import spark.implicits._
        // Dynamic partition pruning: lay the fact out partitioned by the
        // join key, join against a FILTERED dim — Catalyst turns the
        // dim's surviving keys into a runtime partition filter
        // (dynamicpruningexpression, reusing the broadcast exchange), so
        // the fact scan opens only the 2 matching directories out of 5.
        // At 100 TB with date/tenant partitions this is the single
        // biggest I/O lever there is.
        // dataDir registers the staging for shutdown-hook deletion — a
        // raw temp dir would leak a full events copy per bench run
        val layout = graft.streaming.Streams.dataDir("graft_dpp")
        t.events.write.mode("overwrite").partitionBy("event_type").parquet(s"$layout/fact")
        val fact = spark.read.parquet(s"$layout/fact")
        // the dim must be a real datasource scan: a literal local relation
        // would constant-fold its filter away and the DPP rule would see
        // no selective predicate to derive the partition filter from
        Seq(("click", "engagement"), ("view", "engagement"),
            ("purchase", "revenue"), ("signup", "acquisition"), ("error", "ops"))
          .toDF("event_type", "category")
          .write.mode("overwrite").parquet(s"$layout/dim")
        val dim = spark.read.parquet(s"$layout/dim")
        fact
          .join(broadcast(dim.filter(col("category") === "engagement")), Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
               sum(Canon.cents(col("value"))).as("value_cents"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events
             |JOIN (VALUES ('click', 'engagement'), ('view', 'engagement'),
             |             ('purchase', 'revenue'), ('signup', 'acquisition'), ('error', 'ops'))
             |  AS d(event_type, category) USING (event_type)
             |WHERE category = 'engagement'
             |GROUP BY event_type""".stripMargin),
      "dynamic partition pruning: partition-keyed layout + filtered broadcast dim → runtime partition filter on the fact scan"))
}
