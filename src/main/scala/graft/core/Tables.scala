package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet table catalog over a scale-factor directory
  * (`/root/testdata/sf*` layout — one parquet file per table).
  *
  * All engine queries resolve tables through this catalog so that source
  * concerns (paths, formats, future partitioning/bucketing) stay in one
  * place. Scans are plain `spark.read.parquet` → Catalyst owns column
  * pruning + predicate pushdown (verify via `PushedFilters`/`ReadSchema`
  * in `.explain("formatted")`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def path(name: String): String = s"$dir/$name.parquet"
  def table(name: String): DataFrame = spark.read.parquet(path(name))

  def region: DataFrame   = table("region")
  def nation: DataFrame   = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame     = table("part")
  def orders: DataFrame   = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark 4
    * refuses by default ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and
    * rebuild a micro-precision TimestampType column. Integer `div` (not
    * `/`) — epoch-nanos ≈ 1.7e18 overflows double's 53-bit mantissa.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view so `spark.sql` text queries work.
    * `events` goes through the accessor (nanos→micros normalization). */
  def registerAll(): Unit =
    Tables.names.foreach {
      case "events" => events.createOrReplaceTempView("events")
      case n        => table(n).createOrReplaceTempView(n)
    }
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
