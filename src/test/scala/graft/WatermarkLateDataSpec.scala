package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** T5's NEGATIVE contract (SURVEY §2.9): st05 proves on-time windows
  * flush; nothing proved a genuinely LATE row is actually dropped and
  * its window's state actually evicted — the two halves of the Spark
  * watermark contract that make unbounded-stream state bounded. A
  * MemoryStream drives event time explicitly:
  *
  *   batch 1: two rows in window [10:00, 10:10)      → wm after = 09:55
  *   batch 2: one row at 11:00                        → wm after = 10:50
  *   batch 3: a LATE row back at 10:02 (< 10:50)      → must be dropped
  *
  * After batch 2 the engine's watermark-advance batch emits the closed
  * [10:00, 10:10) window (count 2) and evicts its state row. Batch 3
  * then runs WITH the 10:50 watermark: the late row must be dropped
  * (numRowsDroppedByWatermark), must not recreate the evicted window's
  * state, and must neither re-emit nor change the already-appended
  * window — count stays 2, NOT 3. At 100 TB this is the property that
  * keeps the state store O(live windows), not O(stream history). */
class WatermarkLateDataSpec extends SparkTestBase {

  test("T5 negative: late row dropped, closed window emits without it, state evicted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1704103200000L // 2024-01-01 10:00:00 UTC
    def ts(minutes: Int) = new java.sql.Timestamp(base + minutes * 60000L)

    val src = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = src.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()

    Streams.withStreamShufflePartitions(spark) {
      val q = windowed.writeStream
        .outputMode("append")
        .format("memory").queryName("wm_neg_sink")
        .option("checkpointLocation", Streams.scratchDir("graft_cp_wmneg_"))
        .start()
      try {
        src.addData((ts(0), "a"), (ts(5), "a"))
        q.processAllAvailable()
        src.addData((ts(60), "b"))
        q.processAllAvailable() // wm → 10:50; the engine's follow-up
        // no-data batch emits the closed [10:00, 10:10) window and
        // evicts its state row, leaving only the live 11:00 window
        val stateAfterB2 = q.lastProgress.stateOperators(0).numRowsTotal
        assert(stateAfterB2 == 1L,
          s"closed window's state was not evicted after the watermark passed it, rows=$stateAfterB2")
        def output() = spark.table("wm_neg_sink")
          .select(col("window.start").cast("long"), col("k"), col("count"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(output() == Set((base / 1000, "a", 2L)),
          s"closed window must have emitted with its on-time count, saw ${output()}")

        src.addData((ts(2), "a")) // LATE: 10:02 < watermark 10:50
        q.processAllAvailable()

        val dropped = q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsDroppedByWatermark).max
        assert(dropped == 1L,
          s"late row was not dropped by the watermark (dropped=$dropped)")
        val stateAfterLate = q.lastProgress.stateOperators(0).numRowsTotal
        assert(stateAfterLate == 1L,
          s"late row must not recreate evicted window state (rows=$stateAfterLate)")
        assert(output() == Set((base / 1000, "a", 2L)),
          s"late row must neither re-emit nor update the closed window, saw ${output()}")
      } finally {
        q.stop()
        spark.catalog.dropTempView("wm_neg_sink")
      }
    }
  }
}
