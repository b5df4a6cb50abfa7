package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.functions.Canon
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Aggregation surface (SURVEY §2.5: A1–A11).
  *
  * Capability source in the reference: dashboard SQL group-bys
  * (vehicle_counting_app.py:38-47, fire_detection_app.py:64-74,91-102),
  * pandas value_counts/re-agg (streamlit_app.py:76-99), nunique
  * (vehicle_counting_app.py:113-114). Re-expressed over the star schema.
  *
  * Scale notes: all are hash aggregations with map-side partial agg —
  * shuffle carries only group keys + partial buffers. `rollup`/`cube`
  * use Catalyst's Expand (rows × grouping-set count) which is the
  * standard distributed plan. countDistinct of multiple columns plans
  * Expand + two-phase agg; approx_count_distinct (HLL++) is the 100 TB
  * path and is exercised in the bench (not oracle-checked: approximate).
  */
object AggregateQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q01_agg_sum",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.lineitem
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            Canon.sumCents(col("l_extendedprice")).as("sum_base_cents"),
            sum(Canon.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
            Canon.avgExactC2(col("l_quantity")).as("avg_qty_c2"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             |  CAST(floor(avg(l_quantity) * 100 + 0.5) AS BIGINT) AS avg_qty_c2,
             |  count(*) AS n_rows
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      "A1: groupBy+sum (vehicle_counting_app.py:38-47 recast, TPC-H Q1 shape)"),

    GraftQuery(
      "q02_agg_multi",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
            Canon.avgCents(col("o_totalprice")).as("avg_price_cents"),
            max(Canon.cents(col("o_totalprice"))).as("max_price_cents"),
            min(Canon.cents(col("o_totalprice"))).as("min_price_cents"))
      },
      Some("""SELECT o_orderpriority,
             |  count(*) AS n_orders,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
             |  CAST(floor(avg(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) + 0.5) AS BIGINT) AS avg_price_cents,
             |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_price_cents,
             |  CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_price_cents
             |FROM orders
             |GROUP BY o_orderpriority""".stripMargin),
      "A2: COUNT/SUM-CASE/AVG/MAX/MIN multi-agg (fire_detection_app.py:64-74)"),

    GraftQuery(
      "q03_time_bucket",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.events
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
                   col("event_type"))
          .agg(count(lit(1)).as("n_events"),
               Canon.sumCents(col("value")).as("sum_value_cents"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
             |  count(*) AS n_events, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
             |FROM events
             |GROUP BY 1, 2""".stripMargin),
      "A3: tumbling time-bucket agg (fire_detection_app.py:91-102 DATE_TRUNC)"),

    GraftQuery(
      "q04_value_counts",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // A5 value_counts + A6 re-agg: frequency per (lang, source), then
        // second-level sum per lang (streamlit_app.py:76-99 pandas recast).
        t.documents
          .groupBy("lang", "source").count()
          .groupBy("lang")
          .agg(sum(col("count")).as("n_docs"), count(lit(1)).as("n_sources"))
      },
      Some("""SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_sources
             |FROM (SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2)
             |GROUP BY lang""".stripMargin),
      "A5+A6: value_counts then groupby-sum re-agg (streamlit_app.py:76-99)"),

    GraftQuery(
      "q05_distinct_counts",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.lineitem.agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
          count(lit(1)).as("n_rows"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  (SELECT count(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)) AS n_part_supp,
             |  count(*) AS n_rows
             |FROM lineitem""".stripMargin),
      "A7/A10: distinct counts incl. multi-column (vehicle_counting_app.py:113-114 nunique)"),

    GraftQuery(
      "q06_rollup",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.customer
          .rollup("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
               Canon.avgCents(col("c_acctbal")).as("avg_bal_cents"))
          .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
                  col("n_customers"), col("avg_bal_cents"))
      },
      Some("""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             |  count(*) AS n_customers,
             |  CAST(floor(avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) + 0.5) AS BIGINT) AS avg_bal_cents
             |FROM customer GROUP BY ROLLUP (c_mktsegment)""".stripMargin),
      "A9: rollup subtotal hierarchy (Catalyst Expand)"),

    GraftQuery(
      "q07_cube",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                  coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                  col("n_orders"))
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n_orders
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),
      "A9: cube over status × priority"),

    GraftQuery(
      "q08_quantiles",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Exact percentiles for oracle parity; percentile_approx is the
        // 100 TB path (single-pass sketch) and is benchmarked separately.
        // one percentile aggregate evaluating all three points in a single
        // pass (three separate calls would sort/buffer the column thrice)
        t.lineitem
          .agg(expr("percentile(l_extendedprice * 100, array(0.25, 0.5, 0.75))").as("pcts"),
               round(stddev_samp(col("l_extendedprice")), 2).as("sd"),
               round(var_samp(col("l_extendedprice")), 2).as("variance"))
          .select(
            floor(element_at(col("pcts"), 1) + 0.5).cast(LongType).as("p25_cents"),
            floor(element_at(col("pcts"), 2) + 0.5).cast(LongType).as("p50_cents"),
            floor(element_at(col("pcts"), 3) + 0.5).cast(LongType).as("p75_cents"),
            col("sd"), col("variance"))
      },
      Some("""SELECT CAST(floor(quantile_cont(l_extendedprice * 100, 0.25) + 0.5) AS BIGINT) AS p25_cents,
             |  CAST(floor(quantile_cont(l_extendedprice * 100, 0.5) + 0.5) AS BIGINT) AS p50_cents,
             |  CAST(floor(quantile_cont(l_extendedprice * 100, 0.75) + 0.5) AS BIGINT) AS p75_cents,
             |  round(stddev_samp(l_extendedprice), 2) AS sd,
             |  round(var_samp(l_extendedprice), 2) AS variance
             |FROM lineitem""".stripMargin),
      "A11: exact quantiles + stddev/variance"),

    GraftQuery(
      "q09_pivot",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val langs = Seq("de", "en", "es", "fr", "zh")
        val p = t.documents.groupBy("source")
          .pivot("lang", langs).agg(count(lit(1)))
        langs.foldLeft(p)((df, l) => df.withColumn(l, coalesce(col(l), lit(0L))))
      },
      Some("""SELECT source,
             |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
             |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
             |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
             |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
             |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
             |FROM documents GROUP BY source""".stripMargin),
      "A5 wide form: pivot to per-lang counts (streamlit value_counts reindex)"),

    GraftQuery(
      "q78_heavy_hitters",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Heavy-hitter (top-talker) detection with a MERGEABLE
        // Misra-Gries summary (functions.FreqSketchAggregator) — the
        // frequent-items member of the sketch tier (q17 HLL/quantiles,
        // st20 streaming HLL). The event stream's own keys are
        // near-uniform, so plant the production shape deterministically:
        // every 5th event routes to one of 3 hot keys (each ~6.7% of
        // traffic), the rest stay per-user tail — exactly the
        // few-heavies-over-long-tail distribution top-talker monitoring
        // exists for. The summary's CONTENTS are merge-order dependent
        // (any partitioning), so the oracle-compared columns are the
        // exact corpus facts plus MG's two theory-guaranteed audits,
        // both TRUE for every partitioning: all true heavies (count >
        // n/(k+1)) surface, and every estimate is within n/(k+1) below
        // its true count. Exact side = one groupBy for the audit; at
        // 100 TB only the ≤2k-entry summaries move, never the key set.
        val k = 64
        val keyed = t.events.select(
          when(col("event_id") % 5 === 0,
            concat(lit("hot"), (col("event_id") % 3).cast("string")))
            .otherwise(concat(lit("u"), col("user_id").cast("string")))
            .as("key"))
        val mg = udaf(new graft.functions.FreqSketchAggregator(k))
        val sketch = keyed.agg(mg(col("key")).as("entries"))
          .select(explode(col("entries")).as("e"))
          .select(col("e._1").as("key"), col("e._2").as("est"))
        val exact = keyed.groupBy("key").agg(count(lit(1)).as("cnt"))
        val tot = keyed.agg(count(lit(1)).as("n_keys_total"))
        val heavy = exact.crossJoin(broadcast(tot))
          .withColumn("bound", expr(s"n_keys_total div ${k + 1}"))
          .filter(col("cnt") > col("bound"))
          .join(sketch, Seq("key"), "left")
        heavy.agg(
          first(col("n_keys_total")).as("n_keys_total"),
          first(col("bound")).as("bound"),
          count(lit(1)).as("n_heavy"),
          (sum(when(col("est").isNull, 1).otherwise(0)) === 0)
            .as("all_heavy_found"),
          (sum(when(col("est").isNotNull &&
                    (col("est") > col("cnt") ||
                     col("cnt") - col("est") > col("bound")), 1)
            .otherwise(0)) === 0).as("est_within_bound"))
          .select(col("n_keys_total"), lit(k).as("k"), col("bound"),
            col("n_heavy"), col("all_heavy_found"), col("est_within_bound"))
      },
      Some("""WITH keyed AS (
             |  SELECT CASE WHEN event_id % 5 = 0
             |    THEN 'hot' || CAST(event_id % 3 AS VARCHAR)
             |    ELSE 'u' || CAST(user_id AS VARCHAR) END AS key
             |  FROM events),
             |tot AS (SELECT count(*) AS n FROM keyed),
             |ex AS (SELECT key, count(*) AS cnt FROM keyed GROUP BY 1)
             |SELECT (SELECT n FROM tot) AS n_keys_total,
             |  64 AS k,
             |  CAST((SELECT n FROM tot) // 65 AS BIGINT) AS bound,
             |  (SELECT count(*) FROM ex CROSS JOIN tot WHERE cnt > n // 65) AS n_heavy,
             |  TRUE AS all_heavy_found,
             |  TRUE AS est_within_bound""".stripMargin),
      "A-sketch: mergeable Misra-Gries heavy hitters — theory-bound audits vs exact, any merge order"))
}
