package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Second-wave operator coverage: the spark.sql text tier (S4 — the
  * dashboards' SQL surface), explicit-schema from_json (P2), vector
  * centroids, array<struct> round-trips (U3 contract), approximate
  * sketches (the 100 TB path for A7/A11), and map scalars (P17).
  */
object AdvancedQueries extends QueryPack {

  /** Dashboard-style SQL in the common ANSI dialect — the SAME string
    * runs on Spark (over registered temp views) and on the DuckDB oracle.
    * Re-expresses the per-camera stats panel (fire_detection_app.py:64-74). */
  private val dashboardSql =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
      |  CAST(floor(avg(CAST(floor(value * 100 + 0.5) AS BIGINT)) + 0.5) AS BIGINT) AS avg_value_cents,
      |  CAST(floor(max(value) * 100 + 0.5) AS BIGINT) AS max_value_cents
      |FROM events
      |GROUP BY event_type""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q53_sql_text",
      (spark, dir) => {
        Tables(spark, dir).registerAll()
        spark.sql(dashboardSql)
      },
      Some(dashboardSql),
      "S4/§3.3: spark.sql text tier — one ANSI statement runs on both engines"),

    GraftQuery(
      "q80_sql_scripting",
      (spark, dir) => {
        // Spark 4 SQL SCRIPTING (BEGIN/DECLARE/WHILE/SET) — the
        // procedural SQL surface an analyst-facing tier grows into once
        // a dashboard query needs a loop: here an iterative threshold
        // search (smallest power-of-10 cents cutoff whose exceedance
        // tail is < 1 % of events — an alerting-threshold calibration).
        // Each iteration is a full distributed aggregation; the loop is
        // driver-side control flow over O(log range) rounds, the same
        // shape as t19's merge loop. The loop is deterministic (tail
        // fraction is monotone in the cutoff), so the DuckDB oracle
        // computes the identical fixpoint in closed form over a
        // generated exponent series — engine-procedural vs closed-form,
        // same answer.
        Tables(spark, dir).registerAll()
        // scripting.enabled gates parsing only, and SQL scripts execute
        // eagerly inside spark.sql — withConf restores the prior value
        // before the frame is returned, leaking nothing into the session
        graft.core.GraftSession.withConf(spark,
          "spark.sql.scripting.enabled" -> "true") {
        spark.sql("""
          BEGIN
            DECLARE t BIGINT DEFAULT 1;
            DECLARE frac_e4 BIGINT DEFAULT 10000;
            WHILE frac_e4 >= 100 DO
              SET t = t * 10;
              SET frac_e4 = (
                SELECT CAST(floor(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) >= t
                                      THEN 1 ELSE 0 END) * 10000.0 / count(*) + 0.5) AS BIGINT)
                FROM events);
            END WHILE;
            SELECT t AS threshold_cents, frac_e4 AS tail_frac_e4;
          END""")
        }
      },
      Some("""WITH cents AS (
             |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
             |n AS (SELECT count(*) AS n FROM cents),
             |ks AS (SELECT unnest(generate_series(1, 12)) AS k),
             |fr AS (
             |  SELECT k, CAST(floor(sum(CASE WHEN c >= CAST(power(10, k) AS BIGINT)
             |                            THEN 1 ELSE 0 END) * 10000.0 / (SELECT n FROM n) + 0.5) AS BIGINT) AS frac_e4
             |  FROM ks CROSS JOIN cents GROUP BY k)
             |SELECT CAST(power(10, k) AS BIGINT) AS threshold_cents,
             |  frac_e4 AS tail_frac_e4
             |FROM fr WHERE frac_e4 < 100 ORDER BY k LIMIT 1""".stripMargin),
      "S4+: Spark 4 SQL scripting — iterative threshold calibration ≡ closed-form fixpoint"),

    GraftQuery(
      "q33_from_json",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P2 proper: explicit StructType schema parse of the props
        // envelope (consumer_postgres_streaming.py:396-400); malformed
        // input degrades to nulls per from_json contract.
        val schema = new StructType().add("k", IntegerType)
        t.events
          .select(from_json(col("props"), schema).as("data"))
          .select(col("data.k").as("k"))
          .groupBy((col("k") % 7).as("k_mod7"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 AS k_mod7,
             |  count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
             |FROM events GROUP BY 1""".stripMargin),
      "P2: from_json with explicit StructType + struct field projection"),

    GraftQuery(
      "q31_vector_centroid",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Per-label centroid: posexplode → (label, dim) mean. The shuffle
        // carries (label, pos, x) triples — linear in data, no vector
        // materialization on the driver.
        t.embeddings
          .select(col("label"), posexplode(col("embedding")))
          .toDF("label", "pos", "x")
          .groupBy("label", "pos")
          .agg(floor(avg(col("x").cast("double")) * 10000 + 0.5).cast(LongType)
            .as("centroid_e4"))
      },
      Some("""SELECT label, i - 1 AS pos,
             |  CAST(floor(avg(CAST(embedding[i] AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS centroid_e4
             |FROM embeddings, range(1, 65) t(i)
             |GROUP BY 1, 2""".stripMargin),
      "North star: per-label embedding centroids (distributed element-wise mean)"),

    GraftQuery(
      "q34_array_structs",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // U3's array<struct> contract round-trip: pack lineitems into a
        // detections-style array per order, explode back, re-aggregate —
        // conservation against the flat table is the oracle.
        val packed = t.lineitem
          .groupBy("l_orderkey")
          .agg(collect_list(struct(col("l_partkey"), col("l_quantity"))).as("detections"))
        packed
          .select(col("l_orderkey"), explode(col("detections")).as("d"))
          .agg(countDistinct(col("l_orderkey")).as("n_orders"),
               count(lit(1)).as("n_detections"),
               round(sum(col("d.l_quantity")), 2).as("sum_qty"))
      },
      Some("""SELECT count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_detections,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem""".stripMargin),
      "U3/P6: collect_list(struct) → explode round-trip conservation"),

    GraftQuery(
      "q17_approx_sketches",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The 100 TB forms of A7/A11: HLL++ distinct counts and a
        // single-pass quantile sketch. Sketch VALUES are engine-specific,
        // so the cross-engine contract is checked instead: the query
        // emits the exact answers (oracle-comparable) plus boolean
        // error-bound audits the oracle asserts as literal TRUE —
        //   - HLL++ at rsd=0.01 (~1% stderr) audited at ±5% (5σ);
        //   - approx_percentile at accuracy=1000 guarantees rank error
        //     ≤ n/1000; audited as "the sketch value's true rank lies
        //     within ±5% of the target quantile" via a second pass that
        //     counts rows ≤ the sketch value.
        // Pass 1 computes exacts + sketches in one aggregation; pass 2
        // broadcasts the 1-row result back over the table to rank the
        // sketch values. Both passes are map-side-partial aggregations —
        // the scale shape of A7/A11 is unchanged.
        val li = t.lineitem
        // Exact distincts and sketches MUST be separate aggregations:
        // combining countDistinct with HLL/percentile triggers the
        // multi-distinct Expand rewrite, which makes the non-distinct
        // sketches ride along in the per-distinct-value first aggregate —
        // allocating the ~21 KB rsd=0.01 HLL buffer once PER KEY GROUP
        // instead of once per partition (measured 141 s vs 2 s at sf0.1).
        val exacts = li.agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          count(lit(1)).as("n_rows"))
        val sketches = li.agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("pcts"))
        val s = exacts.crossJoin(broadcast(sketches))
          .select(col("exact_parts"), col("exact_orders"), col("n_rows"),
            col("ap"), col("ao"),
            element_at(col("pcts"), 1).as("p50"),
            element_at(col("pcts"), 2).as("p95"))
        li.select(col("l_extendedprice")).crossJoin(broadcast(s))
          .groupBy("exact_parts", "exact_orders", "n_rows", "ap", "ao", "p50", "p95")
          .agg(
            sum(when(col("l_extendedprice") <= col("p50"), 1L).otherwise(0L)).as("rank_p50"),
            sum(when(col("l_extendedprice") <= col("p95"), 1L).otherwise(0L)).as("rank_p95"))
          .select(
            col("exact_parts"), col("exact_orders"),
            (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
              .as("parts_within_5pct"),
            (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05)
              .as("orders_within_5pct"),
            (col("rank_p50") >= col("n_rows") * 0.45 &&
             col("rank_p50") <= col("n_rows") * 0.55).as("p50_rank_within_5pct"),
            (col("rank_p95") >= col("n_rows") * 0.90).as("p95_rank_within_5pct"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
             |  count(DISTINCT l_orderkey) AS exact_orders,
             |  TRUE AS parts_within_5pct,
             |  TRUE AS orders_within_5pct,
             |  TRUE AS p50_rank_within_5pct,
             |  TRUE AS p95_rank_within_5pct
             |FROM lineitem""".stripMargin),
      "A7/A11 scale path: HLL++ + quantile sketch, error-bound contract oracle-checked"),

    GraftQuery(
      "q17b_sketch_reagg",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The 100 TB PRE-AGGREGATION pattern that q17's one-shot sketches
        // can't express: build a small mergeable DataSketches-HLL sketch
        // per partition key (here ship-month), persist those ~16 KB
        // partials, and answer "global distinct" at query time by
        // UNIONING sketches — never rescanning the fact table. This is
        // how a 1000-executor cluster serves daily distinct-count
        // dashboards: the per-day sketch table is a few MB regardless of
        // fact size, and any date-range distinct is a sketch merge.
        // Sketch bytes are engine-specific, so the oracle contract is:
        // per-month and global EXACT counts (value-compared) plus
        // boolean audits that every per-month estimate and the merged
        // global estimate land within ±5 % of exact (lgK=14 → ~0.8 %
        // rsd, so 5 % is a >6σ bound — deterministically TRUE).
        // NOTE each agg keeps exact-distinct and sketch aggregates in
        // SEPARATE passes — see q17's Expand-rewrite comment above.
        val li = t.lineitem
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        val sketches = li.groupBy("ship_month")
          .agg(hll_sketch_agg(col("l_partkey"), 14).as("sk"))
          .localCheckpoint() // the "persisted sketch table": built once,
                             // consumed by the per-month audit AND the union
        val monthEst = sketches
          .select(col("ship_month"), hll_sketch_estimate(col("sk")).as("est_m"))
        val monthExact = li.groupBy("ship_month")
          .agg(countDistinct(col("l_partkey")).as("exact_m"))
        val perMonth = monthEst.join(monthExact, "ship_month")
          .agg(
            count(lit(1)).as("n_months"),
            sum(col("exact_m")).as("sum_month_exacts"),
            sum(when(abs(col("est_m") - col("exact_m")) <= col("exact_m") * 0.05, 1L)
              .otherwise(0L)).as("n_within"))
        val mergedEst = sketches
          .agg(hll_union_agg(col("sk")).as("u"))
          .select(hll_sketch_estimate(col("u")).as("est_g"))
        val globalExact = li.agg(countDistinct(col("l_partkey")).as("exact_parts_global"))
        perMonth.crossJoin(broadcast(mergedEst)).crossJoin(broadcast(globalExact))
          .select(
            col("n_months"), col("sum_month_exacts"), col("exact_parts_global"),
            (col("n_within") === col("n_months")).as("all_months_within_5pct"),
            (abs(col("est_g") - col("exact_parts_global"))
              <= col("exact_parts_global") * 0.05).as("merged_within_5pct"))
      },
      Some("""SELECT count(*) AS n_months,
             |  CAST(sum(exact_m) AS BIGINT) AS sum_month_exacts,
             |  (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_parts_global,
             |  TRUE AS all_months_within_5pct,
             |  TRUE AS merged_within_5pct
             |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS m,
             |        count(DISTINCT l_partkey) AS exact_m
             |      FROM lineitem GROUP BY 1)""".stripMargin),
      "A7 re-agg path: per-month mergeable HLL sketches unioned to a global distinct"),

    GraftQuery(
      "q32_map_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P17 map scalars: build a properties map per row, then read it
        // back via map_keys/element_at. The final output is map-free, so
        // the oracle computes the same result with plain CASE — the map
        // constructor is an engine-side detail, not part of the contract.
        t.events
          .select(col("event_id"),
            map(lit("type"), col("event_type"),
                lit("bucket"), when(col("value") >= 100, "big").otherwise("small"))
              .as("m"))
          .select(col("event_id"),
            size(map_keys(col("m"))).as("n_keys"),
            element_at(col("m"), "type").as("type_val"),
            element_at(col("m"), "bucket").as("bucket_val"))
          .groupBy("type_val", "bucket_val")
          .agg(count(lit(1)).as("n"), max(col("n_keys")).as("n_keys"))
      },
      Some("""SELECT event_type AS type_val,
             |  CASE WHEN value >= 100 THEN 'big' ELSE 'small' END AS bucket_val,
             |  count(*) AS n, 2 AS n_keys
             |FROM events GROUP BY 1, 2""".stripMargin),
      "P17: map construction + map_keys/element_at scalars"),

    GraftQuery(
      "q70_variant_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Spark 4 VARIANT: the open-ended semi-structured type replacing
        // schema-on-read from_json for heterogeneous payloads (binary
        // encoding, typed shredding, no full-schema declaration). The
        // props envelope parses to VARIANT once; fields extract with
        // typed variant_get paths. Output is plain ints/strings so the
        // oracle is engine-neutral JSON extraction.
        t.events
          .select(col("event_id"), col("event_type"),
                  parse_json(col("props")).as("v"))
          .select(col("event_type"),
                  variant_get(col("v"), "$.k", "int").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
               sum(col("k")).as("sum_k"),
               min(col("k")).as("min_k"),
               max(col("k")).as("max_k"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
             |  CAST(min(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS min_k,
             |  CAST(max(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k
             |FROM events GROUP BY 1""".stripMargin),
      "S4/P2 modern form: VARIANT parse + typed variant_get extraction"),

    GraftQuery(
      "q71_sql_pipe",
      (spark, dir) => {
        Tables(spark, dir).registerAll()
        // Spark 4 SQL pipe syntax — the dashboards' SQL tier in the
        // composable FROM ... |> form (each stage reads top-down, the
        // way the DataFrame API composes). Same relational content as a
        // classic GROUP BY, proven by the classic-SQL oracle.
        spark.sql(
          """FROM events
            ||> WHERE value >= 10
            ||> AGGREGATE count(*) AS n_events,
            |     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
            |   GROUP BY event_type
            ||> ORDER BY event_type
            |""".stripMargin)
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
             |FROM events WHERE value >= 10 GROUP BY 1""".stripMargin),
      "S4 modern form: SQL pipe-operator syntax ≡ classic GROUP BY"),

    GraftQuery(
      "q72_sql_params",
      (spark, dir) => {
        Tables(spark, dir).registerAll()
        // Parameterized SQL (named parameter markers) — the injection-
        // safe dashboard pattern: the SQL text is constant, values bind
        // at execution (reference dashboards interpolate strings:
        // streamlit_app.py builds WHERE clauses by hand).
        spark.sql(
          "SELECT event_type, count(*) AS n_events FROM events " +
            "WHERE event_type IN (:a, :b) AND value >= :minv GROUP BY 1",
          Map("a" -> "purchase", "b" -> "click", "minv" -> 5))
      },
      Some("""SELECT event_type, count(*) AS n_events
             |FROM events
             |WHERE event_type IN ('purchase', 'click') AND value >= 5
             |GROUP BY 1""".stripMargin),
      "S4 modern form: named-parameter SQL binding (injection-safe dashboards)"),

    GraftQuery(
      "q73_lateral_topn",
      (spark, dir) => {
        Tables(spark, dir).registerAll()
        // Correlated LATERAL derived table — top-2 lineitems per top-10
        // order. ONE SQL string runs verbatim on both engines (the
        // portable form of the per-group top-N that q40/q44 express in
        // DataFrame algebra). Catalyst decorrelates the lateral subquery
        // to a ranked window join — no per-row re-execution.
        spark.sql(lateralSql)
      },
      Some(lateralSql),
      "S4/J: correlated LATERAL top-N per group, one portable SQL string"))

  /** One SQL text for q73 on BOTH engines (Spark + DuckDB). (A `def`:
    * `queries` above captures it during object init, before a late `val`
    * field would be assigned.) */
  private def lateralSql =
    """SELECT o.o_orderkey, t.l_linenumber, t.price_cents
      |FROM (SELECT o_orderkey, o_totalprice FROM orders
      |      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) o,
      |LATERAL (
      |  SELECT l_linenumber,
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
      |  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
      |ORDER BY o.o_orderkey, t.price_cents DESC""".stripMargin
}
