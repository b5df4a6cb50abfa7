package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.functions.Canon
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Projection / filter / scalar-expression surface (SURVEY §2.3: P1–P17).
  *
  * Everything here is a codegen'd builtin — no UDFs. Filters and column
  * selections reach the parquet scan (`PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`); at 100 TB these queries read only the bytes
  * of the referenced columns.
  */
object ScalarQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q20_filter_project",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P8/P15/S5: pushed-down predicate + pruned projection + derived col.
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                  col("l_discount") >= 0.05 && col("l_quantity") < 24)
          // Row-level money: emit integer cents via floor(x*100 + 0.5).
          // round(x, 2) is engine-divergent on exact .xx5 boundaries (Spark
          // rounds the shortest decimal repr HALF_UP; DuckDB rounds the
          // binary double), while floor of the identical IEEE product is
          // bitwise-deterministic everywhere.
          .select(col("l_orderkey"), col("l_linenumber"),
                  floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
                    .cast(LongType).as("disc_revenue_cents"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS disc_revenue_cents
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin),
      "P8/P15/S5: predicate pushdown + column pruning (TPC-H Q6 shape)"),

    GraftQuery(
      "q21_case_when",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P11: SUM(CASE WHEN …) dashboard shape (fire_detection_app.py:67,96).
        t.events
          .groupBy("event_type")
          .agg(sum(when(col("value") >= 100, 1).otherwise(0)).as("n_large"),
               sum(when(col("value") < 100, 1).otherwise(0)).as("n_small"),
               sum(Canon.cents(when(col("value") >= 100, col("value"))
                 .otherwise(lit(0.0)))).as("large_value_cents"))
      },
      Some("""SELECT event_type,
             |  CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
             |  CAST(sum(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
             |  CAST(sum(CAST(floor((CASE WHEN value >= 100 THEN value ELSE 0.0 END) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS large_value_cents
             |FROM events GROUP BY event_type""".stripMargin),
      "P11: CASE WHEN conditional aggregation (fire_detection_app.py:67)"),

    GraftQuery(
      "q22_string_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P16 string closure: lower/upper/trim/substring/concat/length/like.
        t.part
          .filter(col("p_name").like("%widget%"))
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            substring(col("p_name"), 1, 5).as("name_head"),
            concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
            length(col("p_name")).as("name_len"),
            trim(lower(concat(lit("  "), col("p_name"), lit("  ")))).as("name_norm"))
      },
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
             |  substring(p_name, 1, 5) AS name_head,
             |  concat_ws('/', p_brand, p_type) AS brand_type,
             |  length(p_name) AS name_len,
             |  trim(lower(concat('  ', p_name, '  '))) AS name_norm
             |FROM part WHERE p_name LIKE '%widget%'""".stripMargin),
      "P16: string scalar pack over part names"),

    GraftQuery(
      "q23_date_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P16 date closure: year/month/day, datediff, date_trunc, add_months.
        t.orders
          .filter(year(col("o_orderdate")) === 1997)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
              .as("days_to_98"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            date_format(add_months(col("o_orderdate").cast("date"), 3), "yyyy-MM-dd").as("plus3mo"))
      },
      Some("""SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |  day(o_orderdate) AS dom,
             |  date_diff('day', o_orderdate::DATE, DATE '1998-01-01') AS days_to_98,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  strftime(o_orderdate::DATE + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo
             |FROM orders WHERE year(o_orderdate) = 1997""".stripMargin),
      "P16: date scalar pack (vehicle_counting_app.py:167 strftime, DATE_TRUNC)"),

    GraftQuery(
      "q24_math_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P12/P16 math closure: round/abs/ceil/floor/pow/log/sqrt.
        t.customer.select(
          col("c_custkey"),
          floor(col("c_acctbal") * 10 + 0.5).cast(LongType).as("bal_tenths"),
          round(abs(col("c_acctbal")), 2).as("bal_abs"),
          ceil(col("c_acctbal")).cast(LongType).as("bal_ceil"),
          floor(col("c_acctbal")).cast(LongType).as("bal_floor"),
          round(pow(col("c_acctbal") / 1000.0, 2), 4).as("bal_sq"),
          round(log(abs(col("c_acctbal")) + lit(1.0)), 4).as("bal_ln"),
          round(sqrt(abs(col("c_acctbal"))), 4).as("bal_sqrt"))
      },
      Some("""SELECT c_custkey, CAST(floor(c_acctbal * 10 + 0.5) AS BIGINT) AS bal_tenths,
             |  round(abs(c_acctbal), 2) AS bal_abs,
             |  CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
             |  CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
             |  round(power(c_acctbal / 1000.0, 2), 4) AS bal_sq,
             |  round(ln(abs(c_acctbal) + 1.0), 4) AS bal_ln,
             |  round(sqrt(abs(c_acctbal)), 4) AS bal_sqrt
             |FROM customer""".stripMargin),
      "P12/P16: math scalar pack (ROUND fire_detection_app.py:40-41)"),

    GraftQuery(
      "q25_json",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P2/P17: JSON parse of events.props — the reference's from_json
        // envelope decode (consumer_postgres_streaming.py:396-400).
        t.events
          .select(col("event_id"),
                  get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
             |  count(*) AS n, CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
             |FROM events GROUP BY 1""".stripMargin),
      "P2: get_json_object over props envelope (from_json decode shape)"),

    GraftQuery(
      "q26_array_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P17: array scalars over embedding — size/element_at/slice + HOF
        // aggregate for the L1 norm of the first 8 dims.
        t.embeddings.select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first"),
          round(element_at(col("embedding"), 64).cast("double"), 4).as("last"),
          round(aggregate(slice(col("embedding"), 1, 8),
                          lit(0.0),
                          (acc, x) => acc + abs(x.cast("double"))), 4).as("l1_head"))
      },
      Some("""SELECT vec_id, len(embedding) AS dim,
             |  round(CAST(embedding[1] AS DOUBLE), 4) AS first,
             |  round(CAST(embedding[64] AS DOUBLE), 4) AS last,
             |  round(list_sum(list_transform(embedding[1:8], x -> abs(CAST(x AS DOUBLE)))), 4) AS l1_head
             |FROM embeddings""".stripMargin),
      "P17: array scalar pack + higher-order aggregate over embeddings"),

    GraftQuery(
      "q27_explode",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P6: explode (lateral view) — the reference's one Generator
        // (vehicle_consumer.py:171-175). Conservation: sum over exploded
        // elements grouped by label.
        t.embeddings
          .select(col("label"), explode(col("embedding")).as("x"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_elems"),
               round(sum(col("x").cast("double")), 2).as("sum_x"))
      },
      Some("""SELECT label, count(*) AS n_elems,
             |  round(sum(CAST(x AS DOUBLE)), 2) AS sum_x
             |FROM (SELECT label, unnest(embedding) AS x FROM embeddings)
             |GROUP BY label""".stripMargin),
      "P6: explode/Generate (vehicle_consumer.py:171-175) + conservation agg"),

    GraftQuery(
      "q28_regexp",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P4: regexp_extract — the reference pulls '{aspect}:(\w+)' labels
        // (consumer_postgres_streaming.py:392-393); here we pull the
        // trailing digits of the source tag and the first word of the text.
        t.documents.select(
          col("doc_id"),
          regexp_extract(col("source"), "src(\\d+)", 1).cast(IntegerType).as("src_num"),
          regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"),
          size(regexp_extract_all(col("text"), lit("(spark)"), lit(1))).as("n_spark"))
      },
      Some("""SELECT doc_id,
             |  CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) AS src_num,
             |  regexp_extract(text, '^(\w+)', 1) AS first_word,
             |  len(regexp_extract_all(text, '(spark)', 1)) AS n_spark
             |FROM documents""".stripMargin),
      "P4: regexp_extract / regexp_extract_all (consumer_postgres_streaming.py:392)"),

    GraftQuery(
      "q29_unixtime",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P5: epoch-seconds ↔ timestamp round-trip (vehicle_consumer.py:179).
        t.events
          .select(col("event_id"),
                  unix_timestamp(col("ts")).as("epoch_s"),
                  date_format(timestamp_seconds(unix_timestamp(col("ts"))),
                              "yyyy-MM-dd HH:mm:ss").as("ts_str"))
      },
      Some("""SELECT event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
             |  strftime(to_timestamp(CAST(epoch(date_trunc('second', ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_str
             |FROM events""".stripMargin),
      "P5: from_unixtime/timestamp_seconds round-trip (vehicle_consumer.py:179)"),

    GraftQuery(
      "q30_base64",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // P14: base64/unbase64 — frame payload codec
        // (video_producer.py:93-94, vehicle_consumer.py:94-96).
        t.documents
          // Spark's base64 emits 76-char MIME chunks (\r\n separators);
          // strip them for RFC 4648 parity with other engines.
          .select(col("doc_id"),
                  regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "").as("b64"),
                  col("text"))
          .select(col("doc_id"),
                  length(col("b64")).as("b64_len"),
                  substring(col("b64"), 1, 16).as("b64_head"),
                  // round-trip: decode must reproduce the source string
                  (unbase64(col("b64")).cast("string") === col("text")).as("roundtrip_ok"))
      },
      Some("""SELECT doc_id, length(b64) AS b64_len, substring(b64, 1, 16) AS b64_head,
             |  (from_base64(b64)::VARCHAR = text) AS roundtrip_ok
             |FROM (SELECT doc_id, text, to_base64(text::BLOB) AS b64 FROM documents)""".stripMargin),
      "P14: base64 codec of payload columns (video_producer.py:93-94)"))
}
