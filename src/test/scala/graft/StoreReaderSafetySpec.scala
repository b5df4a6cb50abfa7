package graft

import graft.sources.SnapshotCatalog
import org.apache.spark.sql.functions._

/** The concurrent-reader guarantee of the catalog-backed mutable
  * stores: a reader polling a store WHILE appends, compactions, and
  * retractions rewrite it must always resolve a complete snapshot —
  * never a missing directory (the rename-swap window the catalog
  * replaced), never a torn file list, and never a rows-out-of-bound
  * instant. Each test runs a hammering reader thread against the real
  * maintenance loop and fails on the first reader exception. */
class StoreReaderSafetySpec extends SparkTestBase {

  /** Poll `read` until `stop`, recording the first failure and folding
    * every successful observation through `observe`. */
  private def hammer(read: () => Long, observe: Long => Unit,
                     stop: java.util.concurrent.atomic.AtomicBoolean)
      : (Thread, java.util.concurrent.atomic.AtomicReference[Throwable]) = {
    val firstFailure =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val t = new Thread(() => {
      while (!stop.get()) {
        try observe(read())
        catch {
          case e: Throwable => firstFailure.compareAndSet(null, e); stop.set(true)
        }
      }
    })
    t.setDaemon(true)
    t.start()
    (t, firstFailure)
  }

  test("profile store: reader never sees a missing/partial table during append+compact; row bound holds at every observed instant") {
    import graft.operators.ProfilingQueries._
    import graft.streaming.StreamingQueries
    val o = graft.core.Tables(spark, sfDir).orders
    val store = graft.streaming.Streams.dataDir("graft_rdr_prof_")
    // seed so the reader has a v1 from the start
    assert(StreamingQueries.appendBatchPartial(spark, store, 0L,
      partialProfile(o.filter(col("o_orderkey") % 8 === 0))))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maxRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val (reader, failure) = hammer(
      () => SnapshotCatalog.readSnapshot(spark, store).count(),
      n => { maxRows.getAndUpdate(m => math.max(m, n)); assert(n >= 1L) },
      stop)
    // the st29 maintenance loop: append each batch, compact at 3 rows
    (1 to 11).foreach { bid =>
      StreamingQueries.appendBatchPartial(spark, store, bid.toLong,
        partialProfile(o.filter(col("o_orderkey") % 8 === bid % 8)))
      if (SnapshotCatalog.readSnapshot(spark, store).count() >= 3)
        compactStore(spark, store, o.schema)
    }
    stop.set(true)
    reader.join(30000)
    assert(failure.get() == null,
      s"concurrent reader failed: ${Option(failure.get()).map(_.toString).getOrElse("")}")
    assert(maxRows.get() >= 1L && maxRows.get() <= 3L,
      s"a CONCURRENT reader observed ${maxRows.get()} rows — the ≤ compactEvery bound must hold at every instant, not just at onBatch sampling points")
    // the folded report still matches the one-shot profile
    val merged = mergedProfile(SnapshotCatalog.readSnapshot(spark, store)
        .drop("__bid"), o.schema, Set("o_totalprice"))
      .collect().map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_rows")).toMap
    // bids 0..11 cover residues mod 8, so residues 0..3 contribute twice
    val expectRows = o.count() + o.filter(col("o_orderkey") % 8 <= 3).count()
    assert(merged.values.toSet == Set(expectRows),
      "post-hammer fold lost or double-counted a batch")
  }

  test("LWW store: reader never sees a missing table during append+compactLwwStore") {
    import graft.streaming.StreamingQueries
    val spark2 = spark
    import spark2.implicits._
    def batch(bid: Int) = (0 until 40).map { i =>
      (i.toLong % 7, s"t$bid", bid.toLong * 100 + i, 1.0 + i)
    }.toDF("user_id", "event_type", "event_id", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, 0, 0, event_id)"))
    val store = graft.streaming.Streams.dataDir("graft_rdr_lww_")
    assert(StreamingQueries.appendBatchPartial(spark, store, 0L,
      graft.operators.PipelineQueries.latestByKey(batch(0))))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val (reader, failure) = hammer(
      () => SnapshotCatalog.readSnapshot(spark, store).count(),
      n => assert(n >= 1L && n <= 40L), stop)
    (1 to 9).foreach { bid =>
      StreamingQueries.appendBatchPartial(spark, store, bid.toLong,
        graft.operators.PipelineQueries.latestByKey(batch(bid)))
      if (bid % 3 == 2) StreamingQueries.compactLwwStore(spark, store)
    }
    stop.set(true)
    reader.join(30000)
    assert(failure.get() == null,
      s"concurrent reader failed: ${Option(failure.get()).map(_.toString).getOrElse("")}")
    // after a final compaction the store is one row per key with the
    // latest value — LWW semantics survived the hammering
    StreamingQueries.compactLwwStore(spark, store)
    val rows = SnapshotCatalog.readSnapshot(spark, store)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0L until 7L).toSet, "compacted store lost a key")
    assert(rows.values.forall(_ >= 900L), "compaction kept a stale pre-batch-9 record")
  }

  test("band index: gate probes stay consistent while compaction and retraction rewrite the artifacts") {
    import graft.dedup.DedupQueries
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 24L).map { i =>
      val words = (0 until 30).map(w => s"w${(i % 6) * 100 + w}").mkString(" ")
      (i, words)
    }.toDF("doc_id", "text")
    val indexDir = graft.streaming.Streams.dataDir("graft_rdr_bands_")
    val shDir = graft.streaming.Streams.dataDir("graft_rdr_shs_")
    DedupQueries.buildBandIndex(docs.filter(col("doc_id") < 12), indexDir, shDir)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val (reader, failure) = hammer(
      () => SnapshotCatalog.readSnapshot(spark, indexDir).count() +
            SnapshotCatalog.readSnapshot(spark, shDir).count(),
      n => assert(n >= 1L), stop)
    // maintenance hammering: append, compact, retract in a loop
    (0 until 3).foreach { round =>
      DedupQueries.appendBandIndex(
        docs.filter(col("doc_id") === (12L + round)), indexDir, shDir)
      DedupQueries.compactBandIndex(spark, indexDir, shDir, targetFiles = 2)
      DedupQueries.retractBandIndex(spark,
        Seq(12L + round).toDF("doc_id"), indexDir, shDir)
    }
    stop.set(true)
    reader.join(30000)
    assert(failure.get() == null,
      s"concurrent reader failed: ${Option(failure.get()).map(_.toString).getOrElse("")}")
    // content sanity: every appended doc was retracted again, so the
    // index serves exactly the original 12 docs
    val ids = SnapshotCatalog.readSnapshot(spark, shDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 12L).toSet,
      s"index content drifted under maintenance: $ids")
  }
}
