package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** RocksDB CHANGELOG CHECKPOINTING (Spark 4's production state-
  * durability knob): instead of uploading a full state snapshot per
  * batch, each commit persists only the batch's change log and
  * snapshots are taken in the background — at 100 TB state this is
  * the difference between per-batch upload cost O(state) and
  * O(batch changes). The contract worth pinning is RECOVERY: a
  * restart from a checkpoint whose latest version exists only as
  * changelog files (no snapshot yet) must rebuild exactly the
  * running totals, and the offline statestore reader (st32's
  * surface) must read the same store content back. */
class ChangelogCheckpointSpec extends SparkTestBase {

  test("stateful counters survive a restart under changelog checkpointing; statestore reads it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val cp = Streams.scratchDir("graft_cp_changelog_")
    val src = MemoryStream[(String, Long)]
    def agg = src.toDF().toDF("k", "v").groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))

    graft.core.GraftSession.withConf(spark,
      "spark.sql.streaming.stateStore.providerClass" -> Streams.rocksDbProvider,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
      "graft.streaming.stateStore.explicit" -> "true") {
      Streams.withStreamShufflePartitions(spark) {
        // run 1: two batches, then stop (latest versions live as
        // changelogs — minBatchesToRetain=2 keeps snapshots sparse)
        val q1 = agg.writeStream.outputMode("complete").format("noop")
          .option("checkpointLocation", cp).start()
        try {
          src.addData(("a", 1L), ("b", 2L)); q1.processAllAvailable()
          src.addData(("a", 10L)); q1.processAllAvailable()
        } finally q1.stop()

        // run 2: restart from the same checkpoint — RocksDB must
        // replay the changelog onto the last snapshot to rebuild
        // {a:11, b:2}, then fold the new batch on top
        val q2 = agg.writeStream.outputMode("complete").format("memory")
          .queryName("changelog_sink")
          .option("checkpointLocation", cp).start()
        try {
          src.addData(("b", 5L), ("c", 7L)); q2.processAllAvailable()
        } finally q2.stop()
      }
    }

    val result = spark.table("changelog_sink")
      .select("k", "s", "n").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(result === Map("a" -> (11L, 2L), "b" -> (7L, 2L), "c" -> (7L, 1L)),
      s"restart under changelog checkpointing lost state: $result")
    spark.catalog.dropTempView("changelog_sink")

    // the offline reader sees the same store (st32's surface works
    // against changelog-checkpointed stores too)
    val st = spark.read.format("statestore").load(cp)
      .select(col("key.k"), col("value.sum"), col("value.count"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(st === result, s"offline read diverges from the query's state: $st")
  }
}
