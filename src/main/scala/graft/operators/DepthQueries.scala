package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Third-wave depth: grouping sets, the full analytic-function set,
  * ordered string aggregation, statistical aggregates, and correlated
  * subqueries (Catalyst decorrelation). Several use a single ANSI
  * statement for both engines (the q53 pattern).
  */
object DepthQueries extends QueryPack {

  private val groupingSetsSql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  private val corrSubquerySql =
    """SELECT count(*) AS n_small_lines,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM lineitem l
      |WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
      |                    FROM lineitem l2
      |                    WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q54_grouping_sets",
      (spark, dir) => {
        Tables(spark, dir).registerAll()
        spark.sql(groupingSetsSql)
      },
      Some(groupingSetsSql),
      "A9: explicit GROUPING SETS (Catalyst Expand), shared ANSI statement"),

    GraftQuery(
      "q19_corr_subquery",
      (spark, dir) => {
        Tables(spark, dir).registerAll()
        // Correlated scalar subquery (TPC-H Q17 shape) — Catalyst
        // decorrelates to an aggregate + join; the per-part avg of an
        // integer-valued column is an exact double, so the threshold is
        // engine-identical.
        spark.sql(corrSubquerySql)
      },
      Some(corrSubquerySql),
      "Subquery decorrelation: correlated scalar subquery → agg+join"),

    GraftQuery(
      "q47_window_pack2",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t.orders
          .filter(col("o_custkey") % 20 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd").as("next_order_day"),
            date_format(first(col("o_orderdate")).over(wFrame), "yyyy-MM-dd").as("first_day"),
            date_format(last(col("o_orderdate")).over(wFrame), "yyyy-MM-dd").as("last_day"),
            floor(percent_rank().over(w) * 10000 + 0.5).cast(LongType).as("pct_rank_e4"),
            floor(cume_dist().over(w) * 10000 + 0.5).cast(LongType).as("cume_e4"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  strftime(LEAD(o_orderdate, 1) OVER w, '%Y-%m-%d') AS next_order_day,
             |  strftime(FIRST_VALUE(o_orderdate) OVER wf, '%Y-%m-%d') AS first_day,
             |  strftime(LAST_VALUE(o_orderdate) OVER wf, '%Y-%m-%d') AS last_day,
             |  CAST(floor(PERCENT_RANK() OVER w * 10000 + 0.5) AS BIGINT) AS pct_rank_e4,
             |  CAST(floor(CUME_DIST() OVER w * 10000 + 0.5) AS BIGINT) AS cume_e4
             |FROM orders WHERE o_custkey % 20 = 0
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),
      "§2.6: lead / first_value / last_value / percent_rank / cume_dist"),

    GraftQuery(
      "q48_collect_agg",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Ordered string aggregation: collect_list is unordered by
        // contract, so sort before joining — deterministic on any
        // cluster. (listagg/string_agg WITHIN GROUP equivalent.)
        t.nation
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
               count(lit(1)).as("n_nations"))
      },
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  count(*) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin),
      "A-pack: ordered listagg via array_sort(collect_list) — cluster-deterministic"),

    GraftQuery(
      "q18_stats_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Bivariate statistics: correlation/covariance per returnflag.
        // Ratios floored at e4; the underlying sums differ by ulps across
        // engines but 4 decimals of a O(1e4)-magnitude stat are stable.
        t.lineitem
          .groupBy("l_returnflag")
          .agg(
            floor(corr(col("l_quantity"), col("l_extendedprice")) * 10000 + 0.5)
              .cast(LongType).as("corr_e4"),
            // covar magnitude ~1e4 with ~1e-4 absolute FP-order noise —
            // whole-unit floor keeps the boundary window at ~1e-6
            floor(covar_samp(col("l_quantity"), col("l_extendedprice")) + 0.5)
              .cast(LongType).as("covar_r0"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) AS BIGINT) AS corr_e4,
             |  CAST(floor(covar_samp(l_quantity, l_extendedprice) + 0.5) AS BIGINT) AS covar_r0,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "A11: corr / covar_samp statistical aggregates"),

    GraftQuery(
      "q31b_centroid_udaf",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // U5: the centroid computed by the typed Aggregator instead of
        // posexplode (q31) — same oracle, different physical shape: the
        // shuffle carries one 64-double buffer per (group, partition)
        // rather than 64 rows per vector.
        val vectorAvg = udaf(graft.functions.VectorAvgAggregator,
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
        t.embeddings
          .groupBy("label")
          .agg(vectorAvg(col("embedding")).as("centroid"))
          .select(col("label"), posexplode(col("centroid")))
          .toDF("label", "pos", "x")
          .select(col("label"), col("pos"),
            floor(col("x") * 10000 + 0.5).cast(LongType).as("centroid_e4"))
      },
      Some("""SELECT label, i - 1 AS pos,
             |  CAST(floor(avg(CAST(embedding[i] AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS centroid_e4
             |FROM embeddings, range(1, 65) t(i)
             |GROUP BY 1, 2""".stripMargin),
      "U5: typed Aggregator[Seq[Float], (sums, n), Seq[Double]] centroid via udaf()"),

    GraftQuery(
      "q26b_array_lambdas",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P17 closure: lambda HOFs exists/forall/filter over embeddings.
        // Pure comparisons (no float arithmetic) → engine-identical.
        t.embeddings
          .select(col("label"),
            size(filter(col("embedding"), x => x > 0)).as("n_pos"),
            exists(col("embedding"), x => x > lit(2.0f)).as("has_big"),
            forall(col("embedding"), x => abs(x) < lit(10.0f)).as("all_small"))
          .groupBy("label")
          .agg(sum(col("n_pos")).as("total_pos"),
               sum(when(col("has_big"), 1).otherwise(0)).as("n_has_big"),
               sum(when(col("all_small"), 1).otherwise(0)).as("n_all_small"),
               count(lit(1)).as("n"))
      },
      Some("""SELECT label,
             |  CAST(sum(len(list_filter(embedding, x -> x > 0))) AS BIGINT) AS total_pos,
             |  CAST(sum(CASE WHEN len(list_filter(embedding, x -> x > 2.0)) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_has_big,
             |  CAST(sum(CASE WHEN len(list_filter(embedding, x -> abs(x) >= 10.0)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_small,
             |  count(*) AS n
             |FROM embeddings GROUP BY label""".stripMargin),
      "P17: lambda higher-order functions — filter/exists/forall over arrays"),

    GraftQuery(
      "q08b_group_median",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // A11 per-group: exact median within each group (cent-scaled for
        // engine-identical interpolation).
        t.lineitem
          .groupBy("l_returnflag")
          .agg(floor(expr("percentile(l_extendedprice * 100, 0.5)") + 0.5)
                 .cast(LongType).as("median_cents"),
               count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(floor(quantile_cont(l_extendedprice * 100, 0.5) + 0.5) AS BIGINT) AS median_cents,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "A11: exact per-group median"),

    GraftQuery(
      "q79_kmv_sample",
      (spark, dir) => {
        val t = graft.core.Tables(spark, dir)
        // Bottom-k (KMV) hash sample per group — the MERGEABLE fixed-size
        // sample: every partition keeps its k smallest md5 priorities and
        // a merge keeps the k smallest of the union, so the same k keys
        // surface at any parallelism with zero coordination (q45/q65
        // sample by key-modulo RATE; this samples by SIZE — the primitive
        // behind distinct-sampling and audit subsets at 100 TB). The
        // k-th minimum doubles as the KMV distinct estimator
        // (Bar-Yossef et al.): est = (k-1)·2³²/kth_pri. Priorities are
        // md5 slices (DedupQueries' cross-engine family), so sample
        // membership AND estimate are bit-identical in both engines —
        // exact oracle columns, no tolerance audit needed. Scale shape:
        // one (event_type, user_id) distinct, one window on the group
        // key; at production the window is a bounded per-group heap.
        val k = 16
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("pri"), col("user_id"))
        val kept = t.events.select(col("event_type"), col("user_id")).distinct()
          .withColumn("pri",
            conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
              .cast(LongType))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
        val exact = t.events.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users_exact"))
        kept.groupBy("event_type")
          .agg(count(lit(1)).as("n_sample"),
               coalesce(max(when(col("rn") === k, col("pri"))), lit(0L)).as("kth_pri"),
               array_join(array_sort(collect_list(col("user_id").cast("string"))), ",")
                 .as("sample_users"))
          .join(exact, "event_type")
          .withColumn("kmv_est",
            when(col("n_sample") < k, col("n_sample"))
              .otherwise(expr(s"(${k - 1}L * 4294967296L) div kth_pri")))
          .select(col("event_type"), col("n_users_exact"), col("n_sample"),
            col("kth_pri"), col("kmv_est"),
            floor(abs(col("kmv_est") - col("n_users_exact")) * 10000.0 /
              col("n_users_exact") + 0.5).cast(LongType).as("err_e4"),
            col("sample_users"))
      },
      Some(s"""WITH du AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |pri AS (
             |  SELECT event_type, user_id,
             |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS pri
             |  FROM du),
             |ranked AS (
             |  SELECT event_type, user_id, pri,
             |    row_number() OVER (PARTITION BY event_type ORDER BY pri, user_id) AS rn
             |  FROM pri),
             |kept AS (SELECT * FROM ranked WHERE rn <= 16),
             |agg AS (
             |  SELECT event_type, count(*) AS n_sample,
             |    coalesce(max(CASE WHEN rn = 16 THEN pri END), 0) AS kth_pri,
             |    string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY CAST(user_id AS VARCHAR)) AS sample_users
             |  FROM kept GROUP BY 1),
             |exact AS (
             |  SELECT event_type, count(DISTINCT user_id) AS n_users_exact
             |  FROM events GROUP BY 1),
             |est AS (
             |  SELECT a.event_type, e.n_users_exact, a.n_sample,
             |    CAST(a.kth_pri AS BIGINT) AS kth_pri,
             |    CAST(CASE WHEN a.n_sample < 16 THEN a.n_sample
             |         ELSE (15 * 4294967296) // a.kth_pri END AS BIGINT) AS kmv_est,
             |    a.sample_users
             |  FROM agg a JOIN exact e ON e.event_type = a.event_type)
             |SELECT event_type, n_users_exact, CAST(n_sample AS BIGINT) AS n_sample,
             |  kth_pri, kmv_est,
             |  CAST(floor(abs(kmv_est - n_users_exact) * 10000.0 / n_users_exact + 0.5) AS BIGINT) AS err_e4,
             |  sample_users
             |FROM est""".stripMargin),
      "O2-sketch: bottom-k (KMV) hash sample — mergeable fixed-size sample + distinct estimate, bit-identical cross-engine"))
}
