package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Function-surface breadth (SURVEY §2.3 P4/P6/P17 closures): the map
  * higher-order functions, the full regex family, and outer-generator
  * null semantics — each with a cross-engine value oracle (q32 pinned
  * the map CONSTRUCTORS; q61 pins the map LAMBDAS by canonicalizing the
  * final map to a sorted entries string, since no two engines share a
  * map wire format).
  */
object BreadthQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q61_map_lambdas",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P17 map HOFs: transform_values → map_filter → transform_keys,
        // then canonicalize to "k=v;k=v" (entries sorted by key) so the
        // oracle can compare values without sharing a map type. All
        // codegen'd expressions — per-row map churn at 100 TB never
        // leaves the projection.
        t.events
          .select(col("event_id"),
            map(lit("vmod"), pmod(col("event_id"), lit(100)),
                lit("vc"), floor(col("value") * 100 + 0.5).cast(LongType)).as("m"))
          .select(col("event_id"),
            transform_keys(
              map_filter(
                transform_values(col("m"), (_, v) => v * 2),
                (_, v) => v % 4 === 0),
              (k, _) => concat(k, lit("_x"))).as("m2"))
          .select(col("event_id"),
            array_join(
              transform(sort_array(map_entries(col("m2"))),
                e => concat(e.getField("key"), lit("="),
                            e.getField("value").cast("string"))),
              ";").as("canon"))
      },
      Some("""WITH v AS (
             |  SELECT event_id,
             |    (event_id % 100) * 2 AS vmod2,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) * 2 AS vc2
             |  FROM events)
             |SELECT event_id,
             |  concat_ws(';',
             |    CASE WHEN vc2 % 4 = 0 THEN 'vc_x=' || vc2 END,
             |    CASE WHEN vmod2 % 4 = 0 THEN 'vmod_x=' || vmod2 END) AS canon
             |FROM v""".stripMargin),
      "P17: map transform_values/map_filter/transform_keys, canonicalized entries oracle"),

    GraftQuery(
      "q62_regex_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P4 beyond extract: extract_all (count), global replace, regex
        // split. Patterns stay in the portable char-class subset (Java
        // regex on the engine, RE2-family on typical oracles).
        t.documents
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_words"),
            length(regexp_replace(col("text"), "[aeiou]", "*")).as("replaced_len"),
            size(split(col("text"), " +")).as("n_split"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_words,
             |  length(regexp_replace(text, '[aeiou]', '*', 'g')) AS replaced_len,
             |  CAST(len(string_split_regex(text, ' +')) AS INT) AS n_split
             |FROM documents""".stripMargin),
      "P4: regexp_extract_all / global replace / regex split"),

    GraftQuery(
      "q63_explode_outer",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P6 outer generator: explode_outer keeps the parent row when
        // the array is null (one row, null element) — the LEFT JOIN
        // LATERAL of generators. Null arrays are synthesized on a
        // deterministic key predicate so both engines see identical
        // inputs.
        t.documents
          .select(col("doc_id"),
            when(col("n_chars") % 7 === 0, lit(null))
              .otherwise(split(col("text"), " ")).as("arr"))
          .select(col("doc_id"), explode_outer(col("arr")).as("tok"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_rows"), count(col("tok")).as("n_toks"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CASE WHEN n_chars % 7 = 0 THEN NULL
             |         ELSE string_split(text, ' ') END AS arr
             |  FROM documents),
             |x AS (
             |  SELECT doc_id,
             |    unnest(CASE WHEN arr IS NULL OR len(arr) = 0
             |                THEN [NULL] ELSE arr END) AS tok
             |  FROM d)
             |SELECT doc_id, count(*) AS n_rows, count(tok) AS n_toks
             |FROM x GROUP BY 1""".stripMargin),
      "P6: explode_outer null-array semantics ≡ guarded unnest"),

    GraftQuery(
      "q64_histogram",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // A11 adjunct: fixed-width histogram — the O(n) numeric profile
        // every data-quality pass runs before training. One narrow
        // projection + two-phase agg on the bin key; bin count is
        // data-range-bound, not row-bound, so the shuffle is tiny at
        // any corpus size.
        t.events
          .select(floor(col("value") / 50).cast(LongType).as("bin"),
                  floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
               min(col("cents")).as("min_cents"),
               max(col("cents")).as("max_cents"))
      },
      Some("""SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
             |  count(*) AS n,
             |  CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
             |  CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
             |FROM events GROUP BY 1""".stripMargin),
      "A11: fixed-width histogram binning with per-bin extrema"),

    GraftQuery(
      "q65_stratified_sample",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // O2 extension: deterministic stratified (class-balanced)
        // sampling — per-class keep-rates by key-modulo, the q45 policy
        // generalized per stratum. Reproducible at any cluster size,
        // no rand(), and the modulo predicate stays in the scan filter.
        // This is the class-rebalancing pass a training-data pipeline
        // runs over a skewed event log.
        val rate = map(lit("purchase"), lit(1),
                       lit("click"), lit(4),
                       lit("view"), lit(10))
        t.events
          .withColumn("r", coalesce(element_at(rate, col("event_type")), lit(20)))
          .filter(pmod(col("event_id"), col("r")) === 0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"))
      },
      Some("""SELECT event_type, count(*) AS n_kept
             |FROM events
             |WHERE event_id % (CASE event_type
             |  WHEN 'purchase' THEN 1
             |  WHEN 'click' THEN 4
             |  WHEN 'view' THEN 10
             |  ELSE 20 END) = 0
             |GROUP BY 1""".stripMargin),
      "O2: deterministic class-balanced sampling via per-stratum key-modulo"),

    GraftQuery(
      "q66_salted_agg",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The skew weapon, explicit: two-phase salted aggregation. Phase
        // 1 spreads each hot group key over 8 salt shards (no shard ever
        // holds a whole hot key); phase 2 merges the 8 partials per key.
        // Partials are integer cents (graft.functions.Canon), so the
        // regrouped addition order cannot change the result — the
        // property that makes salting SAFE to apply to money columns.
        // Equivalence with the unsalted form is also spec-proven
        // (ScaleToolsSpec); this entry proves it against the oracle.
        t.lineitem
          .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(graft.functions.Canon.sumCents(col("l_extendedprice")).as("partial_cents"),
               count(lit(1)).as("partial_n"))
          .groupBy("l_returnflag")
          .agg(sum(col("partial_cents")).as("sum_price_cents"),
               sum(col("partial_n")).as("n_rows"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM lineitem GROUP BY 1""".stripMargin),
      "A1 at scale: two-phase salted aggregation ≡ plain groupBy oracle"),

    GraftQuery(
      "q67_funnel",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Ordered-event funnel (view → click → purchase): per user, the
        // first view, the first click AFTER that view, the first
        // purchase AFTER that click; then stage conversion counts.
        // Three stacked whole-partition windows + the per-user agg all
        // share the user_id clustering, so the funnel is ONE shuffle of
        // the event table — no join-backs (q60's sessionization
        // pattern; each stage's threshold is a partition constant the
        // next window's conditional can reference).
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        val staged = t.events
          .withColumn("t_view",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") > col("t_view"),
              col("ts"))).over(w))
          .withColumn("t_purchase",
            min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
              col("ts"))).over(w))
        val perUser = staged.groupBy("user_id")
          .agg(first(col("t_view")).as("t_view"),
               first(col("t_click")).as("t_click"),
               first(col("t_purchase")).as("t_purchase"))
        perUser.agg(
          sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
          sum(when(col("t_click").isNotNull, 1L).otherwise(0L)).as("n_clicked_after"),
          sum(when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("n_converted"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
             |  FROM events GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, v.t_view,
             |    min(CASE WHEN e.event_type = 'click' AND e.ts > v.t_view THEN e.ts END) AS t_click
             |  FROM events e JOIN v USING (user_id) GROUP BY 1, 2),
             |p AS (
             |  SELECT e.user_id, c.t_view, c.t_click,
             |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click THEN e.ts END) AS t_purchase
             |  FROM events e JOIN c USING (user_id) GROUP BY 1, 2, 3)
             |SELECT
             |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
             |  CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after,
             |  CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
             |FROM p""".stripMargin),
      "Analytics: ordered view→click→purchase funnel, conditional-agg form"),

    GraftQuery(
      "q68_time_weighted",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Time-weighted average value per event type: each reading is
        // weighted by how long it was "current" (micros until the next
        // same-type event; the final open-ended reading is excluded).
        // All arithmetic is integer (cents × micros, then integer
        // division) — no float accumulation, so the result is exact and
        // engine-portable even though the weighted sum exceeds 2^53.
        // One shuffle: the lead window and the agg share the
        // event_type clustering.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("ts").asc, col("event_id").asc)
        t.events
          .withColumn("w_micros",
            unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .filter(col("w_micros").isNotNull)
          .withColumn("cents", graft.functions.Canon.cents(col("value")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_intervals"),
               sum(col("w_micros")).as("sum_w_micros"),
               sum(col("cents") * col("w_micros")).as("sum_cw"))
          .select(col("event_type"), col("n_intervals"), col("sum_w_micros"),
                  expr("sum_cw div sum_w_micros").as("twa_cents"))
      },
      Some("""WITH led AS (
             |  SELECT event_type, value,
             |    date_diff('microseconds', ts,
             |      lead(ts, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS w_micros
             |  FROM events),
             |iv AS (
             |  SELECT event_type, w_micros,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM led WHERE w_micros IS NOT NULL)
             |SELECT event_type, count(*) AS n_intervals,
             |  CAST(sum(w_micros) AS BIGINT) AS sum_w_micros,
             |  CAST(sum(cents * w_micros) // sum(w_micros) AS BIGINT) AS twa_cents
             |FROM iv GROUP BY 1""".stripMargin),
      "Analytics: time-weighted average per type — integer-exact, one shuffle"),

    GraftQuery(
      "q69_retention_cohorts",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Cohort retention: users grouped by first-activity day, counted
        // on each subsequent day-offset (classic product-analytics
        // triangle, offsets 0–7). Scale shape: the (user, day) activity
        // set collapses first (one shuffle), the per-user cohort table
        // joins back on user_id, and the final matrix is tiny.
        val cohorts = t.events.groupBy("user_id")
          .agg(date_trunc("day", min(col("ts"))).as("cohort_ts"))
        val activity = t.events
          .select(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
          .distinct()
        activity.join(cohorts, "user_id")
          .withColumn("offset", datediff(col("day_ts"), col("cohort_ts")))
          .filter(col("offset") <= 7)
          .groupBy(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort_day"),
                   col("offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH cohorts AS (
             |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_ts
             |  FROM events GROUP BY 1),
             |activity AS (
             |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day_ts FROM events)
             |SELECT strftime(c.cohort_ts, '%Y-%m-%d') AS cohort_day,
             |  CAST(date_diff('day', c.cohort_ts, a.day_ts) AS INTEGER) AS "offset",
             |  count(*) AS n_users
             |FROM activity a JOIN cohorts c USING (user_id)
             |WHERE date_diff('day', c.cohort_ts, a.day_ts) <= 7
             |GROUP BY 1, 2""".stripMargin),
      "Analytics: first-day cohort retention triangle (offsets 0-7)"))
}
