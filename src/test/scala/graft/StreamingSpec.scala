package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming semantics tests (SURVEY §5.2-4): checkpoint recovery (T3),
  * replay-idempotence of the committed offsets, bounded-stream ≡ batch. */
class StreamingSpec extends SparkTestBase {

  test("T3: checkpoint recovery — restart from committed offsets emits nothing new") {
    val staged = Streams.stageEventsFresh(spark, sfDir)
    val cp = Files.createTempDirectory("graft_cp_recovery").toString
    val out = Files.createTempDirectory("graft_out_recovery").toString

    def runOnce(): Unit = {
      val q = Streams.streamFromStaged(spark, staged, maxFilesPerTrigger = 2)
        .filter(col("event_type") === "click")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    val expected = graft.core.Tables(spark, sfDir).events
      .filter(col("event_type") === "click").count()
    assert(afterFirst == expected, "first drain must equal the batch filter")

    // restart with the same checkpoint: offsets are committed → no replay
    runOnce()
    val afterSecond = spark.read.parquet(out).count()
    assert(afterSecond == afterFirst,
      s"restart replayed data: $afterFirst -> $afterSecond")
  }

  test("bounded stream ≡ batch for a windowed aggregation") {
    val streamed = SparkEntry.queries("st01_stream_window_complete")(spark, sfDir)
      .agg(sum("n_events")).head().getLong(0)
    val batch = graft.core.Tables(spark, sfDir).events.count()
    assert(streamed == batch)
  }

  test("T2: rate limiting produces multiple micro-batches") {
    val stream = Streams.eventsStream(spark, sfDir, maxFilesPerTrigger = 1)
      .select(col("event_id"))
    val (sink, nBatches) = Streams.drainThroughForeachBatch(stream)
    assert(nBatches >= 4, s"expected ≥4 micro-batches, got $nBatches")
    assert(sink.select("event_id").distinct().count() ==
      graft.core.Tables(spark, sfDir).events.count())
  }
}
