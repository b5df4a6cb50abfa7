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

  test("fresh checkpoint bootstraps at the CURRENT latest in one batch; live appends then rate-limit one version per trigger") {
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
      // the bootstrap is the complete snapshot at latest — ONE batch
      // regardless of maxVersionsPerTrigger=1 (Delta initial-snapshot
      // semantics; a rate-capped bootstrap at v1 is the livelock path)
      assert(drained.count(_._2 > 0L) == 1,
        s"expected one bootstrap batch at latest, got $drained")
      assert(drained.map(_._2).sum == 40L, s"rows drifted: $drained")
      // LIVE appends reach the running stream incrementally, one
      // version per trigger now that the bootstrap is done
      SnapshotCatalog.append((41L to 45L).toDF("id").coalesce(1), root, "b4")
      SnapshotCatalog.append((46L to 50L).toDF("id").coalesce(1), root, "b5")
      q.processAllAvailable()
      assert(sink.asScala.map(_._2).sum == 50L,
        "live appends did not flow through the feed")
      assert(sink.asScala.count(_._2 > 0L) == 3,
        s"post-bootstrap appends were not rate-limited to one version " +
          s"per trigger: ${sink.asScala.toVector}")
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

  test("maxBytesPerTrigger rate-limits incremental ranges by log-carried added bytes; an oversized commit still admits one version") {
    val root = graft.streaming.Streams.dataDir("graft_feedbytes_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 5L).toDF("id").coalesce(1), root, "b0")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp = graft.streaming.Streams.scratchDir("graft_feedbytescp_")
    def start() = spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root)
      // smaller than ANY commit's bytes: each incremental trigger must
      // admit exactly one version (the at-least-one rule), never stall
      .option("maxBytesPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        sink.add(bid -> b.count()); ()
      }
      .start()
    val q = start()
    try {
      q.processAllAvailable()
      (1 until 4).foreach { b =>
        val lo = b * 10L + 1L
        SnapshotCatalog.append((lo to lo + 4L).toDF("id").coalesce(1),
          root, s"b$b")
      }
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val drained = sink.asScala.toVector
      assert(drained.map(_._2).sum == 20L, s"rows drifted: $drained")
      // bootstrap (1 batch) + 3 one-version byte-limited batches
      assert(drained.count(_._2 > 0L) == 4,
        s"byte rate limit did not split versions: $drained")
    } finally q.stop()
    // a LARGE cap admits several versions in one trigger
    SnapshotCatalog.append((51L to 55L).toDF("id").coalesce(1), root, "b4")
    SnapshotCatalog.append((61L to 65L).toDF("id").coalesce(1), root, "b5")
    val sink2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp2 = graft.streaming.Streams.scratchDir("graft_feedbytescp2_")
    val q2 = spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root)
      .option("startingVersion", "5") // incremental: versions 5 and 6
      .option("maxBytesPerTrigger", (64L * 1024 * 1024).toString)
      .load()
      .writeStream
      .option("checkpointLocation", cp2)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        sink2.add(bid -> b.count()); ()
      }
      .start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val drained2 = sink2.asScala.toVector
      assert(drained2.map(_._2).sum == 10L, s"startingVersion drifted: $drained2")
      assert(drained2.count(_._2 > 0L) == 1,
        s"a large byte cap should admit both versions in one trigger: $drained2")
    } finally q2.stop()
  }

  test("Trigger.AvailableNow drains the backlog (bootstrap + rate-limited increments) and self-terminates") {
    val root = graft.streaming.Streams.dataDir("graft_feednow_")
    val spark2 = spark
    import spark2.implicits._
    (0 until 3).foreach { b =>
      val lo = b * 10L + 1L
      SnapshotCatalog.append((lo to lo + 9L).toDF("id").coalesce(1),
        root, s"b$b")
    }
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp = graft.streaming.Streams.scratchDir("graft_feednowcp_")
    def drainNow(): Unit = {
      val q = spark.readStream
        .format(classOf[GraftFeedSourceProvider].getName)
        .option("root", root)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
          sink.add(bid -> b.count()); ()
        }
        .start()
      assert(q.awaitTermination(120000),
        "AvailableNow drain did not self-terminate")
    }
    drainNow()
    import scala.jdk.CollectionConverters._
    assert(sink.asScala.map(_._2).sum == 30L,
      s"AvailableNow missed rows: ${sink.asScala.toVector}")
    // backlog lands later; a SECOND AvailableNow run on the same
    // checkpoint drains exactly the delta, one version per trigger
    SnapshotCatalog.append((31L to 35L).toDF("id").coalesce(1), root, "b3")
    SnapshotCatalog.append((36L to 40L).toDF("id").coalesce(1), root, "b4")
    drainNow()
    assert(sink.asScala.map(_._2).sum == 40L,
      s"second AvailableNow run drifted: ${sink.asScala.toVector}")
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

  test("a partitioned table's feed serves partition values; a bootstrap over in-effect DVs serves the deletes-applied snapshot") {
    val root = graft.streaming.Streams.dataDir("graft_feedpart_")
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "p")
    SnapshotCatalog.append(df.coalesce(1), root, "b0", partitionBy = Seq("p"))
    def drainPairs(cp: String): Set[(Long, String)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream
        .format(classOf[GraftFeedSourceProvider].getName)
        // rate-limited: the bootstrap must still land at latest in one
        // batch (the cap applies only to later incremental ranges)
        .option("maxVersionsPerTrigger", "1")
        .option("root", root).load()
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.add(
            r.getLong(r.fieldIndex("id")) -> r.getString(r.fieldIndex("p"))))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    assert(drainPairs(graft.streaming.Streams.scratchDir("graft_feedcp4_")) ==
      (1L to 20L).map(i => i -> (if (i % 2 == 0) "a" else "b")).toSet,
      "feed lost partition values")
    // deletion vectors in effect → the bootstrap serves the snapshot
    // with the deletes SUBTRACTED (Delta's initial snapshot applies
    // DVs) — refusing here would block streaming consumers on exactly
    // the live-DML tables most likely to need them
    SnapshotCatalog.deleteWhere(spark, root, col("id") <= 5L)
    assert(drainPairs(graft.streaming.Streams.scratchDir("graft_feedcp5_")) ==
      (6L to 20L).map(i => i -> (if (i % 2 == 0) "a" else "b")).toSet,
      "DV-bearing bootstrap did not serve the deletes-applied snapshot")
  }

  test("fresh-checkpoint bootstrap of a rewrite-bearing table at maxVersionsPerTrigger=1 drains cleanly (no livelock)") {
    val root = graft.streaming.Streams.dataDir("graft_feedboot_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 10L).toDF("id").coalesce(1), root, "b0")
    SnapshotCatalog.append((11L to 20L).toDF("id").coalesce(1), root, "b1")
    // history now contains a rewrite: the old rate-capped bootstrap
    // landed at v1 and died crossing this on the climb — permanently,
    // since the prescribed fresh-checkpoint restart repeated the path
    SnapshotCatalog.replace(
      SnapshotCatalog.readSnapshot(spark, root).coalesce(1), root, "c0")
    SnapshotCatalog.append((21L to 25L).toDF("id").coalesce(1), root, "b2")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = drainInto(root, graft.streaming.Streams.scratchDir("graft_feedbootcp_"),
      sink, maxPerTrigger = 1)
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(sink.asScala.map(_._2).sum == 25L,
        s"rate-limited fresh-checkpoint bootstrap lost rows: ${sink.asScala.toVector}")
    } finally q.stop()
  }

  test("a schema-changing commit mid-stream fails the query loudly; a fresh restart serves the accreted column") {
    val root = graft.streaming.Streams.dataDir("graft_feedevo_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 5L).toDF("id").coalesce(1), root, "b0")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp = graft.streaming.Streams.scratchDir("graft_feedevocp_")
    val q = drainInto(root, cp, sink, maxPerTrigger = 10)
    q.processAllAvailable()
    // schema accretion lands while the stream runs: serving the new
    // files silently projected onto the pinned schema would drop the
    // new column forever — the source fails the query instead
    SnapshotCatalog.append(
      (6L to 8L).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1), root, "b1")
    val e = intercept[StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      Option(c.getMessage).exists(_.contains("schema changed"))),
      s"schema evolution did not fail the stream: $e")
    q.stop()
    // the operator restarts with a fresh checkpoint: the new source
    // pins the EVOLVED schema and the bootstrap serves the accreted
    // column (old files null-fill it)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[String])]()
    val q2 = spark.readStream
      .format(classOf[GraftFeedSourceProvider].getName)
      .option("root", root).load()
      .writeStream
      .option("checkpointLocation",
        graft.streaming.Streams.scratchDir("graft_feedevocp2_"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => rows.add(
          r.getLong(r.fieldIndex("id")) ->
            Option(r.getString(r.fieldIndex("tag")))))
        ()
      }
      .start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(rows.asScala.toSet ==
        ((1L to 5L).map(_ -> None) ++ (6L to 8L).map(i => i -> Some(s"t$i"))).toSet,
        s"restart did not serve the accreted column: ${rows.asScala.toVector}")
    } finally q2.stop()
  }

  test("readChangeFeed serves row-level inserts AND deletes with _commit_version; the CDF bootstrap is the snapshot as inserts") {
    val root = graft.streaming.Streams.dataDir("graft_feedcdf_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append(
      (1L to 10L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), root, "b0")
    SnapshotCatalog.deleteWhere(spark, root, col("id") <= 3L)
    SnapshotCatalog.mergeOnRead(spark, root,
      Seq((5L, 999L)).toDF("id", "v").coalesce(1), Seq("id"), "m0")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String, Long)]()
    val tsOk = new java.util.concurrent.atomic.AtomicBoolean(true)
    def drainCdc(cp: String, sv: Option[String]): Unit = {
      val r0 = spark.readStream
        .format(classOf[GraftFeedSourceProvider].getName)
        .option("root", root).option("readChangeFeed", "true")
      val q = sv.fold(r0)(r0.option("startingVersion", _)).load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            // the Delta CDF triple: every row also carries the commit's
            // wall clock
            if (r.isNullAt(r.fieldIndex("_commit_timestamp"))) tsOk.set(false)
            got.add((
              r.getLong(r.fieldIndex("id")), r.getLong(r.fieldIndex("v")),
              r.getString(r.fieldIndex("_change_type")),
              r.getLong(r.fieldIndex("_commit_version"))))
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // incremental from v1: every version's row-level delta, stamped
    drainCdc(graft.streaming.Streams.scratchDir("graft_cdfcp_"), Some("1"))
    import scala.jdk.CollectionConverters._
    val rows = got.asScala.toSet
    val expected: Set[(Long, Long, String, Long)] =
      (1L to 10L).map(i => (i, i * 10L, "insert", 1L)).toSet ++
        (1L to 3L).map(i => (i, i * 10L, "delete", 2L)).toSet ++
        Set((5L, 50L, "delete", 3L), (5L, 999L, "insert", 3L))
    assert(rows == expected, s"CDF rows drifted:\n got $rows\n exp $expected")
    assert(tsOk.get(), "_commit_timestamp was null on a CDF row")
    // signed fold over the feed ≡ the live snapshot
    val folded = rows.groupBy(r => (r._1, r._2)).collect {
      case ((id, v), rs)
          if rs.count(_._3 == "insert") > rs.count(_._3 == "delete") => (id, v)
    }.toSet
    val live = SnapshotCatalog.readSnapshotWithDeletes(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(folded == live, s"CDF fold != snapshot: $folded vs $live")
    // fresh-checkpoint CDF bootstrap: the initial snapshot as inserts
    // (DVs applied), stamped at the bootstrap version
    got.clear()
    drainCdc(graft.streaming.Streams.scratchDir("graft_cdfcp2_"), None)
    val boot = got.asScala.toSet
    assert(boot == live.map { case (id, v) => (id, v, "insert", 3L) },
      s"CDF bootstrap drifted: $boot")
  }

  test("spark.readStream.table streams a NAMED catalog table through the feed source; readChangeFeed works by name") {
    val spark2 = spark
    import spark2.implicits._
    val wh = graft.streaming.Streams.dataDir("graft_feedtbl_wh_")
    spark.conf.set("spark.sql.catalog.graftst",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftst.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftst.db")
    val root = s"$wh/db/t1"
    SnapshotCatalog.append((1L to 10L).toDF("id").coalesce(1), root, "b0")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table("graftst.db.t1")
      .writeStream
      .option("checkpointLocation",
        graft.streaming.Streams.scratchDir("graft_feedtblcp_"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == (1L to 10L).toSet,
        s"named streaming read lost rows: ${got.asScala}")
      // live commits flow through the named stream
      SnapshotCatalog.append((11L to 13L).toDF("id").coalesce(1), root, "b1")
      q.processAllAvailable()
      assert(got.asScala.toSet == (1L to 13L).toSet)
    } finally q.stop()
    // CDF by name: the readChangeFeed option rides through the rewrite
    // and the stream serves the SOURCE's annotated schema
    SnapshotCatalog.deleteWhere(spark, root, col("id") <= 2L)
    val cdf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q2 = spark.readStream
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .table("graftst.db.t1")
      .writeStream
      .option("checkpointLocation",
        graft.streaming.Streams.scratchDir("graft_feedtblcp2_"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => cdf.add(
          r.getLong(r.fieldIndex("id")) ->
            r.getString(r.fieldIndex("_change_type"))))
        ()
      }
      .start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(cdf.asScala.toSet ==
        ((11L to 13L).map(_ -> "insert") ++ Seq(1L -> "delete", 2L -> "delete")).toSet,
        s"named CDF stream drifted: ${cdf.asScala.toSet}")
    } finally q2.stop()
  }

  test("writeStream.format(graft-feed) sinks micro-batches as partitioned catalog commits; a replayed batch is a no-op") {
    val spark2 = spark
    import spark2.implicits._
    val root = graft.streaming.Streams.dataDir("graft_feedsink_")
    graft.streaming.Streams.withStreamShufflePartitions(spark) {
      val q = graft.streaming.Streams
        .eventsStream(spark, sfDir, maxFilesPerTrigger = 1)
        .select(col("event_id"), col("event_type"), col("value"))
        .writeStream
        .format(classOf[GraftFeedSourceProvider].getName)
        .option("root", root)
        .option("partitionBy", "event_type")
        .option("checkpointLocation",
          graft.streaming.Streams.scratchDir("graft_feedsinkcp_"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // every micro-batch landed as ONE append commit, hive-partitioned
    assert(SnapshotCatalog.history(root).forall(_._2 == "append"))
    assert(SnapshotCatalog.partitionSpecAt(root,
      SnapshotCatalog.latestVersion(root))
      .exists(_.fieldNames.sameElements(Array("event_type"))),
      "the sink lost the partition layout")
    val got = SnapshotCatalog.readSnapshot(spark, root)
    val src = graft.core.Tables(spark, sfDir).events
      .select(col("event_id"), col("event_type"), col("value"))
    assert(got.count() == src.count(), "the sink lost rows")
    assert(got.select("event_id").except(src.select("event_id")).isEmpty &&
      src.select("event_id").except(got.select("event_id")).isEmpty)
    // a partition-filtered read cuts files at planning time (the whole
    // point of the partitioned sink layout)
    val cut = graft.sources.SnapshotFileIndex.snapshotDF(spark, root)
      .filter(col("event_type") === "signup")
    cut.collect()
    assert(graft.sources.SnapshotFileIndex.scannedFiles(cut) <
      SnapshotCatalog.manifestFiles(root,
        SnapshotCatalog.latestVersion(root)).size)
    // REPLAY: re-delivering an already-committed batch id is a no-op
    // (the append replay guard keyed on the batch name)
    val p = new GraftFeedSourceProvider
    val sink = p.createSink(spark.sqlContext,
      Map("root" -> root, "partitionBy" -> "event_type"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    val vBefore = SnapshotCatalog.latestVersion(root)
    sink.addBatch(0L,
      Seq((-1L, "signup", 1.0)).toDF("event_id", "event_type", "value"))
    assert(SnapshotCatalog.latestVersion(root) == vBefore,
      "a replayed micro-batch id committed a second time")
    assert(SnapshotCatalog.readSnapshot(spark, root)
      .filter(col("event_id") === -1L).count() == 0L)
  }

  test("startingVersion validates at source construction: '0' and non-numeric refuse with a clear message") {
    val root = graft.streaming.Streams.dataDir("graft_feedval_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 3L).toDF("id").coalesce(1), root, "b0")
    val p = new GraftFeedSourceProvider
    def make(sv: String) = p.createSource(spark.sqlContext,
      graft.streaming.Streams.scratchDir("graft_feedvalmd_"), None, "graft-feed",
      Map("root" -> root, "startingVersion" -> sv))
    val e0 = intercept[RuntimeException] { make("0") }
    assert(e0.getMessage.contains("startingVersion must be 'latest' or an " +
      "integer >= 1"), s"wrong message: ${e0.getMessage}")
    val eN = intercept[RuntimeException] { make("nope") }
    assert(eN.getMessage.contains("startingVersion must be 'latest' or an " +
      "integer >= 1"), s"wrong message: ${eN.getMessage}")
    // a valid construction still works
    make("1")
    ()
  }
}
