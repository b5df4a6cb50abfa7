package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, struct, to_json}
import org.apache.spark.sql.streaming.StreamingQuery

/** Sink abstraction for the egress tier — the write-side twin of
  * [[StreamSource]] (SURVEY §2 K1/K4).
  *
  * The reference publishes to Kafka (producer.py:38-53,
  * video_producer.py:107-118: JSON-serialized rows keyed by entity id)
  * and appends to Postgres over JDBC
  * (consumer_postgres_streaming.py:427-440). Neither broker exists in
  * this environment, so the engine programs against this trait: the
  * Kafka and JDBC sinks compile in and bind by format name at runtime
  * (exercised wherever the connector jar / database is configured),
  * while [[FileTopicSink]] reproduces the producer semantics over a
  * parquet "topic" dir — the same emulation contract as
  * [[FileStreamSource]], so a produced topic is directly consumable by
  * the engine's own stream source for round-trip tests.
  */
trait StreamSink extends Serializable {
  /** Start writing the streaming frame; the caller owns the lifecycle. */
  def start(df: DataFrame): StreamingQuery
}

object StreamSink {
  /** Kafka's record contract: (key STRING, value STRING) where value is
    * the JSON-serialized row — the reference producer's
    * `json.dumps(asdict(row))` keyed by entity id (producer.py:44-49). */
  def toRecords(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}

/** Kafka producer sink — compiled in, exercised only where the
  * spark-sql-kafka connector jar is on the classpath. Expects the
  * key/value contract from [[StreamSink.toRecords]]. */
final case class KafkaProducerSink(bootstrapServers: String, topic: String,
                                   checkpointDir: String) extends StreamSink {
  def start(df: DataFrame): StreamingQuery =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()
}

/** File-backed topic: parquet part files are the broker's log segments.
  * Append-mode parquet sink + checkpoint gives the same at-least-once,
  * offset-committed semantics the Kafka sink has; records carry the
  * (key, value) contract so a consumer parses `value` exactly as it
  * would a Kafka message. */
final case class FileTopicSink(topicDir: String,
                               checkpointDir: String) extends StreamSink {
  def start(df: DataFrame): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", topicDir)
      .option("checkpointLocation", checkpointDir)
      .start()
}

/** JDBC append sink — the reference's Postgres edge
  * (consumer_postgres_streaming.py:427-440). Streaming has no native
  * jdbc format, so each micro-batch appends through the batch JDBC
  * writer inside foreachBatch — the same shape the reference uses
  * (`df.write.jdbc(..., mode="append")` per batch), including its
  * empty-frame probe before touching the database (an idle trigger must
  * not open connections or create tables). Exercised end-to-end against
  * embedded Derby in JdbcSinkSpec; any other database is the same code
  * with a different url/driver pair.
  *
  * `idempotent = true` upgrades the channel's at-least-once delivery to
  * effectively-once TABLE CONTENTS — the JDBC twin of
  * [[Streams.idempotentBatchWriter]]'s dynamic-partition overwrite:
  * every row carries its batch_id, and a batch whose id is already
  * present in the table (a crash-recovery replay) is skipped instead of
  * appended twice. One existence probe per batch; the reference's plain
  * append (at-least-once, duplicates on replay) remains the default. */
final case class JdbcBatchSink(url: String, table: String,
                               props: Map[String, String],
                               checkpointDir: String,
                               idempotent: Boolean = false) extends StreamSink {

  /** The per-micro-batch write, exposed so specs can drive a replay
    * directly (the streaming engine only replays after a real crash). */
  def writeBatch(batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty && !(idempotent && alreadyWritten(batch, batchId))) {
      val w = props.foldLeft(
        batch.withColumn("batch_id", lit(batchId))
          .write.format("jdbc")
          .option("url", url).option("dbtable", table)) {
        case (acc, (k, v)) => acc.option(k, v)
      }
      w.mode("append").save()
    }
  }

  /** Replay probe: does the table already hold this batch's rows? A
    * missing table (first-ever batch) reads as "no". */
  private def alreadyWritten(batch: DataFrame, batchId: Long): Boolean =
    try {
      val n = props.foldLeft(
        batch.sparkSession.read.format("jdbc")
          .option("url", url)
          // the writer CREATEs with quoted (case-sensitive) column
          // names — the probe must quote too or Derby/Postgres
          // upper-case-fold the identifier and miss the column
          .option("query",
            s"""SELECT count(*) AS n FROM $table WHERE "batch_id" = $batchId""")) {
        case (acc, (k, v)) => acc.option(k, v)
      }.load().head().getAs[Number](0).longValue()
      n > 0
    } catch { case scala.util.control.NonFatal(_) => false }

  def start(df: DataFrame): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writeBatch _)
      .start()
}
