package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source abstraction for the ingest tier (SURVEY §7 hard part 1).
  *
  * The reference consumes Kafka (consumer_postgres_streaming.py:219-227):
  * subscribe topic, `startingOffsets=earliest`, `maxOffsetsPerTrigger`.
  * This container has no Kafka connector jar, so the engine programs
  * against this trait: identical micro-batch semantics from either
  * implementation, and tests never fork logic.
  */
trait StreamSource extends Serializable {
  /** A rate-limited, earliest-replay streaming DataFrame. */
  def readStream(spark: SparkSession): DataFrame
}

/** File-backed source: a parquet directory is the "topic"; files are the
  * offset unit (`maxFilesPerTrigger` ≙ maxOffsetsPerTrigger; re-listing ≙
  * earliest replay; checkpoint dir ≙ committed consumer offsets). */
final case class FileStreamSource(path: String, schema: StructType,
                                  maxFilesPerTrigger: Int = 1) extends StreamSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
}

/** Kafka source — compiled in, exercised only where the
  * spark-sql-kafka connector jar is on the classpath (format lookup is
  * by name at runtime). Mirrors the reference's consumer options. */
final case class KafkaStreamSource(bootstrapServers: String, topic: String,
                                   maxOffsetsPerTrigger: Long = 10L) extends StreamSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
}
