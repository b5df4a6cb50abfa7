package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}

/** The two state-BOUNDING halves of the Spark-4 stateful API that
  * st11's ValueState alone doesn't prove: event-time TIMERS (st37's
  * GapSessionProcessor — a watermark-fired callback emits the closed
  * session and clears the key) and processing-time TTL (state evicted
  * after an idle period without any callback at all). Both are what
  * keep a never-ending keyspace from growing the store without bound
  * at 100 TB; both are asserted here against the checkpoint itself via
  * the statestore read-back, not just output behavior. */
class StateTimerTtlSpec extends SparkTestBase {

  test("event-time timer fires on watermark passage, emits the session, and EVICTS the key's state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val src = MemoryStream[(Long, java.sql.Timestamp)]
    val cp = Streams.scratchDir("graft_cp_timer_")
    val sessions = src.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "600 seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new graft.streaming.GapSessionProcessor(1800L),
        TimeMode.EventTime(), OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
      .toDF("user_id", "session_start", "session_end", "n_events")

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    Streams.withStreamShufflePartitions(spark) {
      val q = sessions.writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          collected.synchronized {
            collected ++= b.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          }
          ()
        }
        .start()
      try {
        // batch 0: user 1's session (100..200); nothing can emit — the
        // watermark is still far behind the session's 2000 s deadline
        src.addData((1L, ts(100)), (1L, ts(200)))
        q.processAllAvailable()
        assert(collected.synchronized(collected.isEmpty),
          "session emitted before its deadline passed the watermark")
        // batch 1: user 2 at t=5000 drags the watermark to 4400 ≥ 2000
        // → user 1's timer fires WITHOUT any user-1 input
        src.addData((2L, ts(5000)))
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(collected.synchronized(collected.toSet) ==
      Set((1L, 100L, 200L, 2L)),
      s"timer-fired emission wrong: ${collected.mkString(", ")}")

    // the checkpoint's OWN state proves eviction: user 1's row is gone
    // (cleared by the expired timer); user 2's open session remains
    val state = spark.read.format("statestore")
      .option("stateVarName", "sess")
      .load(cp)
      .select(col("key.value").as("user_id"), col("value.*"))
      .collect().map(_.getLong(0)).toSet
    assert(!state.contains(1L),
      "expired timer emitted but did NOT evict the key's state")
    assert(state.contains(2L), "open session's state missing")
  }

  test("late in-watermark rows merge: lower session_start, bridge two buffered sessions, emit ONCE") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val src = MemoryStream[(Long, java.sql.Timestamp)]
    val cp = Streams.scratchDir("graft_cp_merge_")
    val sessions = src.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "3600 seconds") // wide delay: late rows stay in-watermark
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new graft.streaming.GapSessionProcessor(1800L),
        TimeMode.EventTime(), OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
      .toDF("user_id", "session_start", "session_end", "n_events")

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    Streams.withStreamShufflePartitions(spark) {
      val q = sessions.writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          collected.synchronized {
            collected ++= b.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          }
          ()
        }
        .start()
      try {
        // batch 0: TWO gap-separated sessions buffer — (1000,1000) and
        // (4000,4000); the old eager data-close would have EMITTED the
        // first here, making the batch-1 merge impossible
        src.addData((1L, ts(1000)), (1L, ts(4000)))
        q.processAllAvailable()
        assert(collected.synchronized(collected.isEmpty),
          "a session emitted before the watermark proved it closed")
        // batch 1, OUT OF EVENT-TIME ORDER but inside the watermark:
        // t=2500 bridges the two buffered sessions (≤ gap from both
        // ends), t=900 extends the merged session's start DOWNWARD
        src.addData((1L, ts(2500)), (1L, ts(900)))
        q.processAllAvailable()
        // batch 2: another key drags the watermark past the merged
        // session's deadline (5800) → the timer flushes it
        src.addData((2L, ts(99999)))
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(collected.synchronized(collected.toSet) ==
      Set((1L, 900L, 4000L, 4L)),
      s"late-row merge wrong (want ONE session 900..4000 ×4): ${collected.mkString(", ")}")
  }

  test("property: mergeSessions is partition-invariant — any batch split of any row multiset folds to the brute-force sessionization") {
    val rnd = new scala.util.Random(14)
    def bruteForce(rows: Seq[Long], gap: Long): Seq[(Long, Long, Long)] = {
      val sorted = rows.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { t =>
        if (out.nonEmpty && t - out.last._2 <= gap) {
          val l = out.last; out(out.size - 1) = (l._1, math.max(l._2, t), l._3 + 1)
        } else out += ((t, t, 1L))
      }
      out.toSeq
    }
    (1 to 300).foreach { trial =>
      val gap = 1 + rnd.nextInt(20)
      val n = 1 + rnd.nextInt(40)
      // small value range so ties, duplicates, and gap boundaries occur
      val rows = Seq.fill(n)(rnd.nextInt(200).toLong)
      // split into random batches in random order (the cross-batch
      // out-of-order arrival the ADVICE finding was about)
      val shuffled = rnd.shuffle(rows)
      val nBatches = 1 + rnd.nextInt(6)
      val batches = shuffled.grouped(
        math.max(1, (n + nBatches - 1) / nBatches)).toSeq
      val folded = batches.foldLeft(Seq.empty[(Long, Long, Long)]) {
        (cur, batch) =>
          graft.streaming.GapSessionProcessor.mergeSessions(
            cur, batch.sorted, gap.toLong)
      }
      assert(folded == bruteForce(rows, gap.toLong),
        s"trial $trial (gap=$gap): fold over $nBatches batches diverged\n" +
          s"rows=$rows\nfolded=$folded\nbrute=${bruteForce(rows, gap.toLong)}")
    }
  }

  test("processing-time TTL evicts idle state: counters restart after the TTL elapses") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val src = MemoryStream[(Long, Long)]
    val cp = Streams.scratchDir("graft_cp_ttl_")
    val totals = src.toDS()
      .groupByKey(_._1)
      .transformWithState(
        new graft.streaming.RunningTotalsProcessor(
          TTLConfig(java.time.Duration.ofSeconds(3))),
        TimeMode.ProcessingTime(), OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)])
      .toDF("user_id", "n_events", "sum_cents")

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    Streams.withStreamShufflePartitions(spark) {
      val q = totals.writeStream
        .outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          collected.synchronized {
            collected ++= b.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getLong(2)))
          }
          ()
        }
        .start()
      // processAllAvailable would HANG here: in processing-time mode the
      // stateful operator always reports another batch may be needed
      // (time keeps advancing), so the drain barrier never sees
      // "no new data". Poll the sink for the expected row count instead.
      def awaitRows(n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 60000L
        while (collected.synchronized(collected.size) < n) {
          assert(System.currentTimeMillis() < deadline,
            s"timed out waiting for $n output rows; got ${collected.synchronized(collected.toList)}")
          Thread.sleep(50)
        }
      }
      try {
        src.addData((7L, 10L)); awaitRows(1)
        // within TTL: the second batch ACCUMULATES (control arm — the
        // restart below is eviction, not always-fresh state)
        src.addData((7L, 5L)); awaitRows(2)
        Thread.sleep(5000) // idle well past the 3 s TTL
        src.addData((7L, 2L)); awaitRows(3)
      } finally q.stop()
    }
    val runs = collected.synchronized(collected.toList)
    assert(runs.take(2) == List((7L, 1L, 10L), (7L, 2L, 15L)),
      s"pre-TTL accumulation wrong: $runs")
    assert(runs(2) == ((7L, 1L, 2L)),
      s"state survived past its TTL — expected the counter to restart, got ${runs(2)}")
  }
}
