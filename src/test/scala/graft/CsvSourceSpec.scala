package graft

import org.apache.spark.sql.functions._

/** S2: labeled-review CSV ingestion — header + quoted multiline fields,
  * the exact shape of the reference's training data
  * (producer.py:44, train_absa_model.py:97, data/test_data.csv). */
class CsvSourceSpec extends SparkTestBase {

  private lazy val path =
    getClass.getResource("/reviews_fixture.csv").getPath

  test("header + multiLine CSV parses quoted embedded newlines") {
    val df = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .csv(path)
    assert(df.columns.toSeq == Seq("Review", "Price", "Quality", "Service"))
    assert(df.count() == 5)
    // the multiline review stays one row
    assert(df.filter(col("Review").contains("support was slow")).count() == 1)
  }

  test("S3: binaryFile source ingests opaque payloads with metadata") {
    val df = spark.read.format("binaryFile").load(path)
    val row = df.select("length", "content").head()
    assert(row.getLong(0) > 0)
    val content = new String(row.getAs[Array[Byte]]("content"), "UTF-8")
    assert(content.startsWith("Review,Price,Quality,Service"))
  }

  test("M1 label-decode shape applies to the CSV codes") {
    val df = spark.read.option("header", "true").option("multiLine", "true").csv(path)
      .withColumn("price_code", expr("try_cast(Price AS INT)"))
    // −1 in the fixture uses U+2212 (as exported by some tools) → null
    // under try_cast (plain cast throws under ANSI mode); decode must
    // guard like the reference's pandas path
    val decoded = df.select(
      when(col("price_code").isNull, "NONE")
        .when(col("price_code") === 0, "NEU")
        .when(col("price_code") === 1, "POS")
        .otherwise("NEG").as("price_label"))
    assert(decoded.filter(col("price_label") === "POS").count() == 1)
    assert(decoded.count() == 5)
  }
}
