package graft

import graft.sources.{SnapshotCatalog, SnapshotFileIndex}
import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.functions._

/** Round-15 hardening of the catalog's storage tier: conditional-PUT
  * failure semantics (lost race vs transient IO error), the object-store
  * publisher attestation gate, concurrent-append aborts for row-level
  * ops, DV orphan GC, unsigned-UTF-8 string pruning, and the serve
  * path's size-gated DV anti-join. */
class CatalogHardeningSpec extends SparkTestBase {

  private def localFs(p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  // -- conditional-PUT failure semantics --------------------------------

  test("ConditionalPutPublish: dest-exists after failed create is a lost race (false); any other IO failure is rethrown") {
    val root = graft.streaming.Streams.dataDir("graft_condfail_")
    val fs = localFs(root)
    fs.mkdirs(new Path(s"$root/m"))
    def stageTmp(name: String): Path = {
      val t = new Path(s"$root/m/$name")
      val out = fs.create(t, true); out.write("A\tx\n".getBytes("UTF-8")); out.close()
      t
    }
    // lost race: dest pre-exists -> create fails, probe finds it -> false
    val dest = new Path(s"$root/m/commit-v1.txt")
    val out = fs.create(dest, false); out.write("A\twinner\n".getBytes("UTF-8")); out.close()
    assert(!SnapshotCatalog.ConditionalPutPublish.publish(fs, stageTmp(".t1.tmp"), dest))
    // the winner's content is untouched
    val back = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        dest.toUri.getPath)), "UTF-8")
    assert(back == "A\twinner\n", "lost conditional PUT tore the winner's commit")
    // transient IO failure with NO dest: must rethrow, not report a race
    val failing = new FilterFileSystem(fs) {
      override def create(f: Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        if (f.getName.startsWith("commit-"))
          throw new java.io.IOException("injected store outage")
        else super.create(f, overwrite)
    }
    val dest2 = new Path(s"$root/m/commit-v2.txt")
    val e = intercept[java.io.IOException] {
      SnapshotCatalog.ConditionalPutPublish.publish(failing, stageTmp(".t2.tmp"), dest2)
    }
    assert(e.getMessage.contains("injected"),
      "a non-race IO failure was swallowed instead of surfaced")
  }

  test("commitRetry surfaces a non-race publish failure instead of silently spinning at the same version") {
    val root = graft.streaming.Streams.dataDir("graft_condretry_")
    // seed one good version through the normal publisher
    SnapshotCatalog.commitRetry(root)(_ => Seq(s"$root/data/s/part-0.parquet"))
    var attempts = 0
    val outage = new SnapshotCatalog.AtomicPublish {
      def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
        attempts += 1
        val failing = new FilterFileSystem(fs) {
          override def create(f: Path, overwrite: Boolean)
              : org.apache.hadoop.fs.FSDataOutputStream =
            throw new java.io.IOException("injected store outage")
        }
        SnapshotCatalog.ConditionalPutPublish.publish(failing, tmp, dest)
      }
    }
    SnapshotCatalog.withPublisher(outage) {
      val e = intercept[java.io.IOException] {
        SnapshotCatalog.commitRetry(root)(prev =>
          prev :+ s"$root/data/s/part-1.parquet")
      }
      assert(e.getMessage.contains("injected"))
    }
    assert(attempts == 1,
      s"a store outage must abort the retry loop, not spin ($attempts attempts)")
    assert(SnapshotCatalog.latestVersion(root) == 1, "the failed commit left residue")
  }

  test("object-store schemes refuse to commit without an attested conditional-create capability") {
    val dest = new Path("s3a://bucket/table/manifests/commit-v1.txt")
    // un-attested: loud refusal, never a silent HEAD-then-PUT downgrade
    sys.props.remove("graft.objectstore.conditional.create")
    val e = intercept[RuntimeException] { SnapshotCatalog.publisherFor(dest) }
    assert(e.getMessage.contains("conditional"), e.getMessage)
    // attested: routes to the conditional-PUT protocol
    sys.props("graft.objectstore.conditional.create") = "true"
    try assert(SnapshotCatalog.publisherFor(dest) eq SnapshotCatalog.ConditionalPutPublish)
    finally sys.props.remove("graft.objectstore.conditional.create")
  }

  // -- concurrent-write conflicts for row-level ops ----------------------

  /** Publisher hook that lets a CONCURRENT append win the victim op's
    * version just before the victim's own publish attempt — the
    * deterministic two-writer interleaving a thread race can't pin. */
  private class RaceInjector(root: String, mkRacer: () => Unit, armFor: String)
      extends SnapshotCatalog.AtomicPublish {
    @volatile private var armed = true
    def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
      if (armed && dest.getName == armFor) {
        armed = false
        mkRacer() // lands the concurrent commit first (re-entrant publishes pass through)
      }
      SnapshotCatalog.LocalLinkPublish.publish(fs, tmp, dest)
    }
  }

  test("deleteWhere aborts when a concurrent append lands between its snapshot read and its commit") {
    val root = graft.streaming.Streams.dataDir("graft_delrace_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 50L).toDF("id").coalesce(1), root, "b0")
    val injector = new RaceInjector(root,
      () => SnapshotCatalog.append((51L to 60L).toDF("id").coalesce(1), root, "race"),
      armFor = "commit-v2.txt")
    SnapshotCatalog.withPublisher(injector) {
      val e = intercept[java.util.ConcurrentModificationException] {
        SnapshotCatalog.deleteWhere(spark, root, col("id") % 10 === 0)
      }
      assert(e.getMessage.contains("stale"), e.getMessage)
    }
    // the racer's append landed; the aborted delete left no DV commit
    assert(SnapshotCatalog.latestVersion(root) == 2)
    assert(SnapshotCatalog.readSnapshotWithDeletes(spark, root).count() == 60L)
    // the caller's retry against the new snapshot succeeds and sees the
    // racer's rows as delete candidates too
    val (_, nDel) = SnapshotCatalog.deleteWhere(spark, root, col("id") % 10 === 0)
    assert(nDel == 6L, s"retry should match 10..60 multiples of 10, got $nDel")
  }

  test("mergeOnRead aborts on a concurrent append that could land duplicate keys") {
    val root = graft.streaming.Streams.dataDir("graft_morrace_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").coalesce(1), root, "b0")
    // the racer appends id=999 — the same key the merge is inserting:
    // an undetected race would leave TWO rows for 999
    val injector = new RaceInjector(root,
      () => SnapshotCatalog.append(
        Seq((999L, 1L)).toDF("id", "v").coalesce(1), root, "race"),
      armFor = "commit-v2.txt")
    SnapshotCatalog.withPublisher(injector) {
      val e = intercept[java.util.ConcurrentModificationException] {
        SnapshotCatalog.mergeOnRead(spark, root,
          Seq((5L, 100L), (999L, 100L)).toDF("id", "v"), Seq("id"), "u0")
      }
      assert(e.getMessage.contains("stale"), e.getMessage)
    }
    // retried against the new snapshot: the racer's 999 row now matches
    val (_, nM) = SnapshotCatalog.mergeOnRead(spark, root,
      Seq((5L, 100L), (999L, 100L)).toDF("id", "v"), Seq("id"), "u1")
    assert(nM == 2L, s"retry should match 5 AND the racer's 999, got $nM")
    val served = SnapshotCatalog.readSnapshotWithDeletes(spark, root)
    assert(served.groupBy("id").count().agg(max("count")).head().getLong(0) == 1L,
      "the upsert left duplicate keys")
    assert(served.filter(col("id") === 999L).head().getLong(1) == 100L)
  }

  test("deleteWhere proceeds past a concurrent append PROVABLY disjoint from its predicate; still aborts on overlap") {
    val root = graft.streaming.Streams.dataDir("graft_delnarrow_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 50L).toDF("id").coalesce(1), root, "b0")
    // the racer's file carries log stats [1000, 1010] — disjoint from
    // the delete's envelope id <= 10, so the Delta-style narrowing
    // skips the conflict: the delete commits WITHOUT losing its CAS
    val injector = new RaceInjector(root,
      () => SnapshotCatalog.append((1000L to 1010L).toDF("id").coalesce(1),
        root, "race"),
      armFor = "commit-v2.txt")
    SnapshotCatalog.withPublisher(injector) {
      val (v, nDel) = SnapshotCatalog.deleteWhere(spark, root, col("id") <= 10L)
      assert(nDel == 10L, s"delete matched $nDel rows")
      assert(v == 3, "the delete should land AFTER the racer's append")
    }
    val served = SnapshotCatalog.readSnapshotWithDeletes(spark, root)
    assert(served.count() == 40L + 11L,
      "narrowed delete lost rows or kept deleted ones")
    assert(served.filter(col("id") <= 10L).count() == 0L)
    assert(served.filter(col("id") >= 1000L).count() == 11L,
      "the disjoint append's rows must survive whole")
    // an OVERLAPPING append (ids 15..17 inside the new envelope id <= 20)
    // still aborts — the narrowing must not over-skip
    val injector2 = new RaceInjector(root,
      () => SnapshotCatalog.append((15L to 17L).toDF("id").coalesce(1),
        root, "race2"),
      armFor = "commit-v4.txt")
    SnapshotCatalog.withPublisher(injector2) {
      val e = intercept[java.util.ConcurrentModificationException] {
        SnapshotCatalog.deleteWhere(spark, root, col("id") <= 20L)
      }
      assert(e.getMessage.contains("stale"), e.getMessage)
    }
  }

  test("mergeOnRead proceeds past a concurrent append provably outside its key envelope") {
    val root = graft.streaming.Streams.dataDir("graft_mornarrow_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").coalesce(1), root, "b0")
    // update keys {5, 9} → envelope [5, 9]; the racer appends id 2000 —
    // provably key-disjoint from the stats, so the merge proceeds
    val injector = new RaceInjector(root,
      () => SnapshotCatalog.append(
        Seq((2000L, 1L)).toDF("id", "v").coalesce(1), root, "race"),
      armFor = "commit-v2.txt")
    SnapshotCatalog.withPublisher(injector) {
      val (_, nM) = SnapshotCatalog.mergeOnRead(spark, root,
        Seq((5L, 100L), (9L, 100L)).toDF("id", "v"), Seq("id"), "u0")
      assert(nM == 2L, s"merge matched $nM")
    }
    val served = SnapshotCatalog.readSnapshotWithDeletes(spark, root)
    assert(served.count() == 21L)
    assert(served.groupBy("id").count().agg(max("count")).head().getLong(0) == 1L,
      "the narrowed merge left duplicate keys")
    assert(served.filter(col("id") === 5L).head().getLong(1) == 100L)
    assert(served.filter(col("id") === 2000L).count() == 1L)
  }

  test("mergeInto proceeds past a provably key-disjoint concurrent append; aborts on overlap") {
    import graft.sources.SnapshotCatalog.{MergeDeleteClause, MergeInsertClause, MergeUpdateClause}
    val root = graft.streaming.Streams.dataDir("graft_ginarrow_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").coalesce(1), root, "b0")
    val matched = Seq(
      MergeDeleteClause(Some(col("__src_op") === "del")),
      MergeUpdateClause(None, Seq("v" -> col("__src_nv"))))
    val notMatched = Seq(MergeInsertClause(None,
      Seq("id" -> col("__src_id"), "v" -> col("__src_nv"))))
    // source keys {4, 6} → envelope [4, 6]; the racer appends id 3000 —
    // provably disjoint from the log stats, the generalized merge
    // proceeds without losing its CAS (the mergeOnRead narrowing rule)
    val injector = new RaceInjector(root,
      () => SnapshotCatalog.append(
        Seq((3000L, 1L)).toDF("id", "v").coalesce(1), root, "race"),
      armFor = "commit-v2.txt")
    SnapshotCatalog.withPublisher(injector) {
      val (_, nA) = SnapshotCatalog.mergeInto(spark, root,
        Seq((4L, 40L, "upd"), (6L, 0L, "del")).toDF("id", "nv", "op"),
        Seq("id"), matched, notMatched, "g0")
      assert(nA == 2L, s"mergeInto actioned $nA")
    }
    val served = SnapshotCatalog.readSnapshotWithDeletes(spark, root)
    assert(served.count() == 20L, "delete+racer accounting drifted")
    assert(served.filter(col("id") === 4L).head().getLong(1) == 40L)
    assert(served.filter(col("id") === 6L).count() == 0L)
    assert(served.filter(col("id") === 3000L).count() == 1L,
      "the disjoint append's row must survive")
    // an OVERLAPPING concurrent append (id 5 inside the next merge's
    // envelope) still aborts — matched positions are stale
    val injector2 = new RaceInjector(root,
      () => SnapshotCatalog.append(
        Seq((5L, 1L)).toDF("id", "v").coalesce(1), root, "race2"),
      armFor = "commit-v4.txt")
    SnapshotCatalog.withPublisher(injector2) {
      val e = intercept[java.util.ConcurrentModificationException] {
        SnapshotCatalog.mergeInto(spark, root,
          Seq((5L, 50L, "upd")).toDF("id", "nv", "op"),
          Seq("id"), matched, notMatched, "g1")
      }
      assert(e.getMessage.contains("stale"), e.getMessage)
    }
  }

  // -- DV orphan GC ------------------------------------------------------

  test("a zero-match merge leaves no DV batch behind; sweepOrphans GCs uncommitted DV litter past the grace window") {
    val root = graft.streaming.Streams.dataDir("graft_dvleak_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").coalesce(1), root, "b0")
    // merge with NO matching keys: pure insert — its staged DV batch is
    // empty and must be cleaned up, not leaked forever
    SnapshotCatalog.mergeOnRead(spark, root,
      Seq((999L, 1L)).toDF("id", "v"), Seq("id"), "u0")
    val dvDir = new java.io.File(s"$root/dv")
    assert(!dvDir.exists() || dvDir.listFiles().isEmpty,
      "zero-match merge leaked its empty DV batch")
    // a real delete's DV batch is committed and must SURVIVE the sweep
    val (_, nDel) = SnapshotCatalog.deleteWhere(spark, root, col("id") % 10 === 0)
    assert(nDel == 2L)
    // crash litter: a DV batch written but never committed
    val litter = s"$root/dv/crashed"
    Seq(("file:///nowhere", 0L)).toDF("__dv_file", "__dv_pos")
      .coalesce(1).write.parquet(litter)
    assert(SnapshotCatalog.sweepOrphans(root, graceMs = 3600000L) == 0,
      "sweep GC'd inside the grace window")
    assert(SnapshotCatalog.sweepOrphans(root, graceMs = 0L) > 0)
    assert(!new java.io.File(litter).exists(), "uncommitted DV batch survived the sweep")
    // the committed DVs still apply
    assert(SnapshotCatalog.readSnapshotWithDeletes(spark, root).count() == 19L)
  }

  // -- unsigned-UTF-8 string pruning --------------------------------------

  test("string pruning orders by unsigned UTF-8 bytes: non-ASCII data where UTF-16 order diverges is never wrongly skipped") {
    val root = graft.streaming.Streams.dataDir("graft_utf8prune_")
    val spark2 = spark
    import spark2.implicits._
    // U+10000 (surrogate pair, UTF-8 f0 90 80 80) vs U+E000 (ee 80 80):
    // bytewise U+10000 > U+E000, but Java UTF-16 order says the
    // OPPOSITE (0xD800 < 0xE000) — the exact divergence that made the
    // old String-compare skip a file containing matching rows
    val supp = new String(Character.toChars(0x10000))
    val e000 = "\ue000"
    SnapshotCatalog.append(Seq((1L, supp)).toDF("id", "k").coalesce(1), root, "b0")
    SnapshotCatalog.append(Seq((2L, "apple")).toDF("id", "k").coalesce(1), root, "b1")
    // Spark's own row comparison is bytewise: the supplementary row
    // matches k >= U+E000, so the pruned scan MUST keep its file
    val df = SnapshotFileIndex.snapshotDF(spark, root).filter(col("k") >= e000)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L),
      "bytewise pruning lost the supplementary-plane row")
    assert(SnapshotFileIndex.scannedFiles(df) == 1L,
      "the ASCII file should still prune away")
    // same order on the explicit pruned-read API: range [U+E000, U+10001]
    // contains U+10000 bytewise (Java order would skip the file)
    val hi = new String(Character.toChars(0x10001))
    val (dfS, nS, totS) = SnapshotCatalog.readSnapshotPrunedStr(
      spark, root, "k", e000, hi)
    assert(totS == 2 && nS == 1, s"read $nS/$totS files")
    assert(dfS.filter(col("k").between(e000, hi)).count() == 1L)
  }

  // -- size-gated DV anti-join on the planner-integrated serve path -------

  test("snapshotDF degrades the DV anti-join to a shuffle past the broadcast gate; broadcasts under it") {
    val root = graft.streaming.Streams.dataDir("graft_dvgate_")
    val spark2 = spark
    import spark2.implicits._
    SnapshotCatalog.append((1L to 100L).toDF("id").coalesce(1), root, "b0")
    SnapshotCatalog.deleteWhere(spark, root, col("id") % 2 === 0L)
    val expect = (1L to 100L).filter(_ % 2 == 1).toSet
    def servedPlan(): (Set[Long], String) = {
      val df = SnapshotFileIndex.snapshotDF(spark, root)
      val got = df.collect().map(_.getLong(0)).toSet
      (got, df.queryExecution.executedPlan.toString)
    }
    // under the gate (default 64 MB): DV side broadcasts
    val (gotB, planB) = servedPlan()
    assert(gotB == expect)
    assert(planB.contains("BroadcastHashJoin") && planB.contains("LeftAnti"),
      s"small DV set should broadcast:\n$planB")
    // past the gate: the engine must STOP FORCING a broadcast. The
    // planner (and AQE) may still choose one when the measured size is
    // genuinely small — that size-based choice is exactly what the gate
    // restores; the hazard was the unconditional hint building an
    // arbitrarily large DV set on the driver. To observe the hint's
    // absence with kilobyte test data, disable the size-based
    // auto-broadcast: any remaining BroadcastHashJoin could then only
    // come from a forced hint.
    val autoPrev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    sys.props("graft.dv.broadcast.max.bytes") = "1"
    try {
      val (gotS, planS) = servedPlan()
      assert(gotS == expect, "gated plan changed results")
      assert(!planS.contains("BroadcastHashJoin"),
        s"DV side past the gate must not force a broadcast:\n$planS")
      assert(planS.contains("LeftAnti"), s"anti-join disappeared:\n$planS")
      // readSnapshotWithDeletes rides the same gate
      val df = SnapshotCatalog.readSnapshotWithDeletes(spark, root)
      assert(df.collect().map(_.getLong(0)).toSet == expect)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"readSnapshotWithDeletes past the gate must not force a broadcast:\n$p")
      // under the gate the hint still wins over the disabled threshold —
      // proof the earlier broadcast came from the engine's own request
      sys.props.remove("graft.dv.broadcast.max.bytes")
      val (gotH, planH) = servedPlan()
      assert(gotH == expect)
      assert(planH.contains("BroadcastHashJoin"),
        s"under the gate the engine should still request the broadcast:\n$planH")
    } finally {
      sys.props.remove("graft.dv.broadcast.max.bytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoPrev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
