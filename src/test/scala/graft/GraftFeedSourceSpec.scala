package graft

import graft.sources.{GraftFeedSourceProvider, SnapshotCatalog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

/** The catalog change feed as a first-class `readStream` source:
  * version-ranged micro-batches off the delta log, rate limiting,
  * live incremental appends, rewrite refusal as stream failure, and
  * restart re-baseline. */
class GraftFeedSourceSpec extends SparkTestBase {

  private def drainInto(root: String, checkpoint: String,
                        sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)],
                        maxPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root)
      .option("maxVersionsPerTrigger", maxPerTrigger.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        sink.add(bid -> b.count()); ()
      }
      .start()
  }

  test("incremental drain: one version per micro-batch, content equals the snapshot, live appends flow through") {
    val root = graft.streaming.Streams.dataDir("graft_feedsrc_")
    val spark2 = spark
    import spark2.implicits._
    (0 until 4).foreach { b =>
      val lo = b * 10L + 1L
      SnapshotCatalog.append((lo to lo + 9L).toDF("id").coalesce(1), root, s"b$b")
    }
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp = graft.streaming.Streams.scratchDir("graft_feedcp_")
    val q = drainInto(root, cp, sink)
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val drained = sink.asScala.toVector
      // rate limit: the 4 staged versions arrive as >= 4 batches (the
      // bootstrap serves v1's files, then one version per trigger)
      assert(drained.count(_._2 > 0L) >= 4,
        s"expected >=4 rate-limited batches, got $drained")
      assert(drained.map(_._2).sum == 40L, s"rows drifted: $drained")
      // LIVE appends reach the running stream incrementally
      SnapshotCatalog.append((41L to 45L).toDF("id").coalesce(1), root, "b4")
      SnapshotCatalog.append((46L to 50L).toDF("id").coalesce(1), root, "b5")
      q.processAllAvailable()
      assert(sink.asScala.map(_._2).sum == 50L,
        "live appends did not flow through the feed")
    } finally q.stop()
    // RESTART on the same checkpoint with the rate limit still on: the
    // source's high-watermark must survive the restart — a reset-to-0
    // watermark would report an offset below the committed one and
    // re-deliver an already-processed version on the climb back up
    SnapshotCatalog.append((51L to 53L).toDF("id").coalesce(1), root, "b6")
    val q2 = drainInto(root, cp, sink)
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(sink.asScala.map(_._2).sum == 53L,
        s"restart replayed or lost rows: ${sink.asScala.toVector}")
    } finally q2.stop()
  }

  test("a compaction inside the polled range FAILS the stream; a fresh checkpoint re-baselines from the snapshot") {
    val root = graft.streaming.Streams.dataDir("graft_feedrw_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 10L).toDF("id").coalesce(1), root, "b0")
    SnapshotCatalog.append((11L to 20L).toDF("id").coalesce(1), root, "b1")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp = graft.streaming.Streams.scratchDir("graft_feedcp2_")
    val q = drainInto(root, cp, sink)
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(sink.asScala.map(_._2).sum == 20L)
    // the maintenance rewrite lands while the consumer is down
    SnapshotCatalog.replace(
      SnapshotCatalog.readSnapshot(spark, root).coalesce(1), root, "c0")
    SnapshotCatalog.append((21L to 25L).toDF("id").coalesce(1), root, "b2")
    // resuming on the SAME checkpoint must fail loudly — the range
    // crosses the rewrite and an adds-only fold would double-count
    val q2 = drainInto(root, cp, sink)
    val e = intercept[StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(30000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("replace")), s"wrong failure: $e")
    q2.stop()
    // the operator restarts with a FRESH checkpoint: the bootstrap
    // batch re-baselines from the complete current snapshot
    val sink2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp2 = graft.streaming.Streams.scratchDir("graft_feedcp3_")
    val q3 = drainInto(root, cp2, sink2, maxPerTrigger = 100)
    try {
      q3.processAllAvailable()
      assert(sink2.asScala.map(_._2).sum == 25L,
        "re-baseline did not serve the full post-rewrite snapshot")
    } finally q3.stop()
  }

  test("startingVersion skips the bootstrap: incremental from the named version; 'latest' serves only future commits") {
    val root = graft.streaming.Streams.dataDir("graft_feedsv_")
    val spark2 = spark
    import spark2.implicits._
    (0 until 3).foreach { b =>
      val lo = b * 10L + 1L
      SnapshotCatalog.append((lo to lo + 9L).toDF("id").coalesce(1), root, s"b$b")
    }
    def drainFrom(sv: String): Set[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream
        .format(classOf[GraftFeedSourceProvider].getName)
        .option("root", root).option("startingVersion", sv).load()
        .writeStream
        .option("checkpointLocation",
          graft.streaming.Streams.scratchDir("graft_feedsvcp_"))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.add(r.getLong(0))); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    // from version 3 (inclusive): only b2's rows — no bootstrap
    assert(drainFrom("3") == (21L to 30L).toSet,
      "startingVersion did not begin incrementally at the named version")
    // from version 1: everything, served INCREMENTALLY (still refuses
    // rewrites, unlike the snapshot bootstrap)
    assert(drainFrom("1") == (1L to 30L).toSet)
    // 'latest': nothing staged is served; a live append flows
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root).option("startingVersion", "latest").load()
      .writeStream
      .option("checkpointLocation",
        graft.streaming.Streams.scratchDir("graft_feedsvcp2_"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.isEmpty, s"'latest' served staged history: ${got.asScala}")
      SnapshotCatalog.append((31L to 33L).toDF("id").coalesce(1), root, "b3")
      q.processAllAvailable()
      assert(got.asScala.toSet == (31L to 33L).toSet,
        "'latest' did not serve the live append")
    } finally q.stop()
  }

  test("a partitioned table's feed serves partition values; a bootstrap over in-effect DVs refuses") {
    val root = graft.streaming.Streams.dataDir("graft_feedpart_")
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "p")
    SnapshotCatalog.append(df.coalesce(1), root, "b0", partitionBy = Seq("p"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root).load()
      .writeStream
      .option("checkpointLocation", graft.streaming.Streams.scratchDir("graft_feedcp4_"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(
          r.getLong(r.fieldIndex("id")) -> r.getString(r.fieldIndex("p"))))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet ==
        (1L to 20L).map(i => i -> (if (i % 2 == 0) "a" else "b")).toSet,
        "feed lost partition values")
    } finally q.stop()
    // deletion vectors in effect → an adds-only bootstrap would serve
    // deleted rows: refused loudly until a compaction applies them
    SnapshotCatalog.deleteWhere(spark, root, col("id") <= 5L)
    val q2 = spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root).load()
      .writeStream
      .option("checkpointLocation", graft.streaming.Streams.scratchDir("graft_feedcp5_"))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(30000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("deletion vectors"))),
      s"DV bootstrap did not refuse: $e")
    q2.stop()
  }
}
