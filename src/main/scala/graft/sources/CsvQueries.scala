package graft.sources

import graft.{GraftQuery, QueryPack}
import org.apache.spark.sql.functions._

/** CSV source tier (SURVEY §2 S2): labeled-review ingestion with the
  * reference's exact data shape — header row, quoted fields with
  * embedded newlines, and label codes that include U+2212 minus signs
  * as exported by some tools (producer.py:44, train_absa_model.py:97,
  * data/test_data.csv). The decode must null-guard those codes
  * (try_cast), like the reference's pandas path.
  */
object CsvQueries extends QueryPack {

  /** The fixture ships on the main classpath so both the engine and the
    * DuckDB oracle read THE SAME file (classes dir, not a jar). */
  lazy val fixturePath: String =
    getClass.getResource("/reviews_fixture.csv").getPath

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "csv01_labeled_reviews",
      (spark, _) => {
        // S2 + M1: header/multiLine CSV → try_cast label codes → decoded
        // label distribution. Independent of sfDir by design: the CSV
        // tier reads the training-data fixture, not the parquet tables.
        spark.read
          .option("header", "true")
          .option("multiLine", "true")
          .csv(fixturePath)
          .select(expr("try_cast(Price AS INT)").as("price_code"),
                  length(col("Review")).as("review_len"))
          .select(
            when(col("price_code").isNull, "NONE")
              .when(col("price_code") === 0, "NEU")
              .when(col("price_code") === 1, "POS")
              .otherwise("NEG").as("price_label"),
            col("review_len"))
          .groupBy("price_label")
          .agg(count(lit(1)).as("n_reviews"),
               sum(col("review_len")).as("sum_review_len"))
      },
      Some(s"""SELECT
              |  CASE WHEN TRY_CAST(Price AS INT) IS NULL THEN 'NONE'
              |       WHEN TRY_CAST(Price AS INT) = 0 THEN 'NEU'
              |       WHEN TRY_CAST(Price AS INT) = 1 THEN 'POS'
              |       ELSE 'NEG' END AS price_label,
              |  count(*) AS n_reviews,
              |  CAST(sum(length(Review)) AS BIGINT) AS sum_review_len
              |FROM read_csv('$fixturePath', header = true,
              |              all_varchar = true)
              |GROUP BY 1""".stripMargin),
      "S2/M1: header+multiline CSV ingest, null-guarded label decode"))
}
