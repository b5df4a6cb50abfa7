package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fourth wave: as-of join (an operator Spark lacks natively — composed
  * per the preference ladder: existing ops express the semantics, so no
  * custom SparkPlan needed), unpivot, and null-semantics scalars.
  */
object AsofQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q57_asof_join",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // AS-OF JOIN: each purchase matched to the same user's most
        // recent click at-or-before it. Distributed composition: tag both
        // sides, union, one window pass carrying the last click forward
        // (partition by user, order by (ts, side) — side 0 = click first
        // so an equal-timestamp click is visible to the purchase).
        // One shuffle on user_id; no range join, no state blowup. The
        // oracle is DuckDB's native ASOF JOIN.
        val ev = t.events
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("side"),
                  col("event_id").as("c_id"), col("value").as("c_value"),
                  lit(null).cast("long").as("p_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("side"),
                  lit(null).cast("long").as("c_id"),
                  lit(null).cast("double").as("c_value"),
                  col("event_id").as("p_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("side").asc, col("c_id").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("asof_c_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
          .withColumn("asof_c_value", last(when(col("side") === 0, col("c_value")), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("p_id").as("purchase_id"), col("user_id"),
            (unix_micros(col("ts")) - unix_micros(col("asof_c_ts"))).as("gap_us"),
            floor(col("asof_c_value") * 100 + 0.5).cast(LongType).as("click_value_cents"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, value,
             |         date_trunc('microseconds', ts) AS ts
             |  FROM events),
             |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts, value FROM e WHERE event_type = 'click')
             |SELECT p.event_id AS purchase_id, p.user_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
             |  CAST(floor(c.value * 100 + 0.5) AS BIGINT) AS click_value_cents
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin),
      "As-of join (nearest prior event) — union+window composition ≡ native ASOF JOIN"),

    GraftQuery(
      "q55_unpivot",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Unpivot (wide→long) via stack — inverse of q09_pivot.
        t.customer
          .groupBy("c_nationkey")
          .agg(sum(when(col("c_mktsegment") === "BUILDING", 1).otherwise(0)).as("building"),
               sum(when(col("c_mktsegment") === "MACHINERY", 1).otherwise(0)).as("machinery"))
          .select(col("c_nationkey"),
            expr("stack(2, 'building', building, 'machinery', machinery) AS (segment, n)"))
          .filter(col("n") > 0)
      },
      Some("""WITH wide AS (
             |  SELECT c_nationkey,
             |    CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS building,
             |    CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS machinery
             |  FROM customer GROUP BY c_nationkey)
             |SELECT c_nationkey, segment, n FROM (
             |  SELECT c_nationkey, 'building' AS segment, building AS n FROM wide
             |  UNION ALL
             |  SELECT c_nationkey, 'machinery' AS segment, machinery AS n FROM wide)
             |WHERE n > 0""".stripMargin),
      "P-pack: unpivot/stack (wide→long), inverse of pivot"),

    GraftQuery(
      "q56_null_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Null semantics: nullif/coalesce/null-safe equality. Synthetic
        // nulls from nullif since testdata is null-free.
        t.events
          .select(col("event_id"),
            nullif(col("event_type"), lit("error")).as("type_or_null"),
            col("value"))
          .select(
            coalesce(col("type_or_null"), lit("(errored)")).as("type_filled"),
            col("type_or_null").eqNullSafe(lit("click")).as("is_click_nullsafe"),
            when(col("type_or_null").isNull, 0.0).otherwise(col("value")).as("v"))
          .groupBy("type_filled", "is_click_nullsafe")
          .agg(count(lit(1)).as("n"),
               sum(floor(col("v") * 100 + 0.5).cast(LongType)).as("v_cents"))
      },
      Some("""SELECT
             |  coalesce(nullif(event_type, 'error'), '(errored)') AS type_filled,
             |  (nullif(event_type, 'error') IS NOT DISTINCT FROM 'click') AS is_click_nullsafe,
             |  count(*) AS n,
             |  CAST(sum(CAST(floor((CASE WHEN nullif(event_type, 'error') IS NULL
             |      THEN 0.0 ELSE value END) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v_cents
             |FROM events
             |GROUP BY 1, 2""".stripMargin),
      "P-pack: nullif / coalesce / null-safe equality (<=>) semantics"),

    GraftQuery(
      "q58_date_spine",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Gap-filling over a generated calendar spine: sequence+explode
        // builds the date dimension in-engine, left join zero-fills days
        // with no events (the dashboard time-axis operation the reference
        // delegates to Plotly). Spine is tiny → broadcast side.
        val bounds = t.events.agg(
          to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
        val spine = bounds.select(
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val daily = t.events
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        spine.join(daily, Seq("day"), "left")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
                  coalesce(col("n"), lit(0L)).as("n_events"))
      },
      Some("""WITH b AS (SELECT min(ts)::DATE AS d0, max(ts)::DATE AS d1 FROM events),
             |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
             |daily AS (SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1)
             |SELECT strftime(s.day, '%Y-%m-%d') AS day,
             |  coalesce(d.n, 0) AS n_events
             |FROM spine s LEFT JOIN daily d ON d.day = s.day""".stripMargin),
      "Gap-fill: generated date spine (sequence+explode) + zero-filled left join"),

    GraftQuery(
      "q74_resample_ffill",
      (spark, dir) => {
        // Time-series resample + forward fill (pandas `resample('1h')
        // .max().ffill()` per key): hourly buckets per event_type over
        // the full span, observation gaps carried forward by the last
        // non-null bucket value. The carry is `last(_, ignoreNulls)`
        // over a per-key ordered window — ONE shuffle on event_type,
        // and the window state is a single value per key. Hours before
        // a key's first observation stay NULL (nothing to carry).
        // Spine = distinct types × generated hour sequence (tiny →
        // broadcast side of the left join).
        val ev = Tables(spark, dir).events
        val bounds = ev.agg(
          date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        val spine = bounds
          .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
          .crossJoin(broadcast(ev.select(col("event_type")).distinct()))
        val hourly = ev
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(max(graft.functions.Canon.cents(col("value"))).as("obs_cents"))
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(hourly, Seq("event_type", "hour"), "left")
          .select(col("event_type"),
            date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
            last(col("obs_cents"), ignoreNulls = true).over(w).as("filled_cents"),
            col("obs_cents").isNotNull.as("observed"))
      },
      Some("""WITH b AS (
             |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
             |  FROM events),
             |spine AS (
             |  SELECT t.event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
             |  FROM b CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
             |hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS hour,
             |    max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS obs_cents
             |  FROM events GROUP BY 1, 2)
             |SELECT s.event_type, strftime(s.hour, '%Y-%m-%d %H:00') AS hour,
             |  last_value(h.obs_cents IGNORE NULLS) OVER (
             |    PARTITION BY s.event_type ORDER BY s.hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
             |  (h.obs_cents IS NOT NULL) AS observed
             |FROM spine s
             |LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour""".stripMargin),
      "Resample: hourly buckets per key + forward fill via ordered-window carry"))
}
