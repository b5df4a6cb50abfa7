package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-isolated table catalog over plain parquet — the
  * table-format seam (Iceberg/Delta-style) expressed with nothing but
  * files and atomic manifest publishes, so the ENGINE-side semantics
  * (atomic publish, snapshot isolation, time travel, file-level reuse
  * across versions, optimistic concurrency, snapshot expiry) are
  * implemented and testable without a format dependency.
  *
  * Layout under a table root:
  * {{{
  *   <root>/data/<batch>/part-*.parquet    immutable data files
  *   <root>/manifests/manifest-v<N>.txt    one absolute file path per line
  * }}}
  *
  * The CURRENT version is the highest manifest number present — there
  * is no mutable `latest` pointer file, so a commit is ONE atomic
  * publish (tmp manifest → `manifest-v<N>.txt`) and there is no crash
  * window in which the table has a manifest but no pointer, or a
  * pointer to a manifest that does not exist yet.
  *
  * Contract:
  *   - data files are IMMUTABLE once a manifest references them — a new
  *     version adds new files and a new manifest, never rewrites old
  *     files (so an in-flight reader of v1 is never torn by a v2
  *     commit). [[writeData]] enforces this against at-least-once
  *     replays: a batch dir any surviving manifest references is never
  *     rewritten — the already-committed file list is returned instead;
  *   - a commit publishes version N exclusively: two racing committers
  *     cannot both land on N. [[commitRetry]] is the optimistic
  *     transaction loop — on collision it re-reads the new latest
  *     manifest and re-applies its delta at N+1, so concurrent
  *     appenders both succeed and neither's files are lost;
  *   - time travel = reading an old manifest, which stays valid until
  *     an explicit [[expire]], which removes old manifests FIRST and
  *     only then the data files no surviving manifest references.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API
  * resolved from the active session's configuration: on a local run it
  * binds to the local FS, on a cluster to HDFS — where `rename` is an
  * atomic namespace operation, making the exclusive manifest publish a
  * true compare-and-swap. The local FS's `rename` overwrites an
  * existing destination (POSIX), so the publish additionally holds a
  * per-root JVM lock around an existence check — exact for any number
  * of committers in one driver, and documentation-honest about the
  * object-store translation (a conditional PUT / If-None-Match, same
  * reader-visible semantics).
  *
  * At 100 TB this is the shape that makes compaction (src09), partition
  * corrections (src10), streaming appends (st36), and the engine's own
  * mutable stores (the LSH band index, the LWW store, the profile
  * partial stores) safe under concurrent readers: writers stage
  * immutable files, then publish a manifest; a reader always resolves
  * a COMPLETE version — never a half-written directory, and never the
  * "no table at all" window a rename-based directory swap leaves.
  */
object SnapshotCatalog {

  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  private val ManifestName = """manifest-v(\d+)\.txt""".r

  private def manifestDir(root: String) = new Path(s"$root/manifests")
  private def manifestPath(root: String, v: Int) =
    new Path(manifestDir(root), s"manifest-v$v.txt")

  /** All committed versions, ascending (empty before the first commit). */
  def versions(root: String): Seq[Int] = {
    val mdir = manifestDir(root)
    val fs = fsFor(mdir)
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .collect { case ManifestName(n) => n.toInt }.sorted
  }

  def latestVersionOption(root: String): Option[Int] = versions(root).lastOption

  def latestVersion(root: String): Int =
    latestVersionOption(root).getOrElse(
      sys.error(s"no committed version under $root"))

  /** True once the root has at least one committed version. */
  def isTable(root: String): Boolean = latestVersionOption(root).isDefined

  def manifestFiles(root: String, v: Int): Seq[String] = {
    val p = manifestPath(root, v)
    readUtf8(fsFor(p), p).linesIterator.filter(_.nonEmpty).toSeq
  }

  /** The files a replayed batch already committed (via ANY surviving
    * manifest — not just the latest: a compaction may have dropped the
    * batch from the live version while an older manifest still time-
    * travels to it, and rewriting the dir would tear that snapshot). */
  private def committedBatchFiles(root: String, batch: String): Seq[String] = {
    // cheap absence proof first: a manifest can only reference files
    // that were staged, so a batch whose data dir does not exist was
    // never committed (or was expired — and expire removes the
    // manifests referencing it BEFORE its files, so "committed" is
    // false then too). This keeps the COMMON case — a genuinely new
    // batch — at one existence probe instead of a scan of every
    // manifest; the full newest-first scan runs only for dirs that do
    // exist (replays and crash leftovers). Corollary, same as every
    // table format's vacuum contract: expiry retention must exceed the
    // redelivery horizon, or a replayed expired batch re-lands.
    val dir = new Path(s"$root/data/$batch")
    if (!fsFor(dir).exists(dir)) Seq.empty
    else {
      val marker = s"/data/$batch/"
      versions(root).reverseIterator
        .map(v => manifestFiles(root, v).filter(_.contains(marker)))
        .collectFirst { case fsFound if fsFound.nonEmpty => fsFound }
        .getOrElse(Seq.empty)
    }
  }

  /** True when any surviving manifest references the batch's data dir. */
  def isBatchCommitted(root: String, batch: String): Boolean =
    committedBatchFiles(root, batch).nonEmpty

  /** Write `df` as an immutable data batch under the table root;
    * returns the batch's data-file paths (sorted, absolute). If the
    * batch is already referenced by a surviving manifest (an
    * at-least-once replay after a crash between commit and checkpoint),
    * the data is NOT rewritten — the committed file list is returned —
    * because committed files are immutable: a rewrite would replace
    * them with new part names and break every manifest (including time
    * travel) that lists the old ones. An UNcommitted leftover dir (a
    * crash mid-write, before any manifest referenced it) is rewritten. */
  def writeData(df: DataFrame, root: String, batch: String): Seq[String] = {
    val already = committedBatchFiles(root, batch)
    if (already.nonEmpty) already
    else {
      val path = s"$root/data/$batch"
      df.write.mode("overwrite").parquet(path)
      listDataFiles(path)
    }
  }

  def listDataFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = fsFor(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.toString).sorted
  }

  /** Total on-disk bytes of the LIVE snapshot's data files — exactly
    * the manifest-listed files, so expired/superseded generations don't
    * inflate size-gated decisions (broadcast-vs-join thresholds). */
  def liveDataBytes(root: String): Long =
    latestVersionOption(root).map { v =>
      manifestFiles(root, v).map { f =>
        val p = new Path(f); fsFor(p).getFileStatus(p).getLen
      }.sum
    }.getOrElse(0L)

  // one commit lock per root: the local FS's rename overwrites an
  // existing destination (POSIX), so exclusivity inside one JVM needs
  // the exists-check + rename to be mutually exclusive; on HDFS the
  // rename itself fails when the destination exists and the lock is
  // merely redundant serialization of same-driver committers
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Try to publish exactly version `v` with file list `files`.
    * Returns false (leaving no residue) when `v` is already taken —
    * the caller's cue to re-read the latest state and retry at the
    * next version ([[commitRetry]]). The publish is tmp-write + an
    * exclusive rename, so a reader never observes a partially written
    * manifest and two committers never both land on `v`. */
  def tryCommit(root: String, v: Int, files: Seq[String]): Boolean = {
    val mdir = manifestDir(root)
    val fs = fsFor(mdir)
    if (!fs.exists(mdir)) fs.mkdirs(mdir)
    val tmp = new Path(mdir,
      s".manifest-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    writeUtf8(fs, tmp, files.mkString("\n") + "\n")
    val fin = manifestPath(root, v)
    val lock = commitLocks.computeIfAbsent(root, _ => new Object)
    val won = lock.synchronized {
      !fs.exists(fin) && fs.rename(tmp, fin)
    }
    if (!won) fs.delete(tmp, false)
    won
  }

  /** Commit `files` as the complete next snapshot, CAS-retrying past
    * version collisions (two racing committers both succeed, on
    * consecutive versions). Returns the committed version. Use
    * [[commitRetry]] instead when the new snapshot DERIVES from the
    * previous one (append/replace) — a plain retry of a stale file
    * list would silently drop the racing committer's files. */
  def commit(root: String, files: Seq[String]): Int =
    commitRetry(root)(_ => files)

  /** The optimistic transaction loop: compute the next snapshot's file
    * list FROM the current latest (`delta(prevFiles)`), publish it
    * exclusively at latest+1, and on collision re-read the new latest
    * and re-apply the delta — so concurrent appenders serialize without
    * losing each other's files. Returns the committed version. */
  def commitRetry(root: String, maxAttempts: Int = 100)(
      delta: Seq[String] => Seq[String]): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val pv = latestVersionOption(root).getOrElse(0)
      val prev = if (pv == 0) Seq.empty else manifestFiles(root, pv)
      if (tryCommit(root, pv + 1, delta(prev))) return pv + 1
      attempt += 1
    }
    sys.error(s"commit on $root lost $maxAttempts consecutive CAS races")
  }

  /** Append `df` as a new batch: its files join the previous snapshot's
    * (set union — file-level reuse). Replay-idempotent: a batch name a
    * surviving manifest already references commits nothing and returns
    * the current latest version. Returns the (possibly new) version. */
  def append(df: DataFrame, root: String, batch: String): Int = {
    if (isBatchCommitted(root, batch)) latestVersion(root)
    else {
      val files = writeData(df, root, batch)
      commitRetry(root)(prev => (prev ++ files).distinct.sorted)
    }
  }

  /** Replace the table's LIVE content with `df` (compaction, retraction,
    * fold-rewrite): the new version references ONLY the new batch's
    * files; prior versions keep time-traveling to the old files until
    * [[expire]]. Replay-idempotent like [[append]]. Returns the version. */
  def replace(df: DataFrame, root: String, batch: String): Int = {
    if (isBatchCommitted(root, batch)) latestVersion(root)
    else {
      val files = writeData(df, root, batch)
      commitRetry(root)(_ => files.distinct.sorted)
    }
  }

  /** Snapshot expiry / GC — the maintenance job every table format
    * ships separately. Keeps the newest `keepLast` versions (covering
    * in-flight readers of recent snapshots) and removes, IN THIS ORDER:
    * (1) the expired manifests — after which no new reader can resolve
    * those versions; (2) the data files referenced by no surviving
    * manifest; (3) batch dirs left empty. A crash between (1) and (2)
    * leaves only unreferenced-but-present files — re-running expire
    * collects them; the reverse order would leave surviving manifests
    * pointing at deleted files. Returns
    * (expired manifest count, deleted data file count). */
  def expire(root: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the latest version")
    val vs = versions(root)
    val drop = vs.dropRight(keepLast)
    if (drop.isEmpty) (0, 0)
    else {
      val keep = vs.takeRight(keepLast)
      val live = keep.flatMap(manifestFiles(root, _)).toSet
      val dead = drop.flatMap(manifestFiles(root, _)).toSet -- live
      drop.foreach { v =>
        val p = manifestPath(root, v); fsFor(p).delete(p, false)
      }
      dead.foreach { f =>
        val p = new Path(f); fsFor(p).delete(p, false)
      }
      // sweep batch dirs the GC emptied
      dead.map(f => new Path(f).getParent).foreach { d =>
        val fs = fsFor(d)
        if (fs.exists(d) && fs.listStatus(d).forall(s =>
              s.getPath.getName.startsWith(".") || s.getPath.getName.startsWith("_")))
          fs.delete(d, true)
      }
      (drop.size, dead.size)
    }
  }

  /** Orphan sweep — the second half of GC: a writer that crashed
    * between [[writeData]] and its commit leaves a batch dir no
    * manifest ever referenced, which [[expire]] (which reasons only
    * over manifests) never touches. Deletes files under `data/` that
    * (a) appear in NO surviving manifest and (b) are older than
    * `graceMs` — the grace window is what makes this safe to run
    * beside live writers: an in-flight batch's files are young, so the
    * sweep cannot GC a batch that is about to be committed. Returns
    * the number of files removed. Run it with `graceMs` comfortably
    * above the longest write-to-commit latency (table formats ship
    * the same knob as e.g. `remove-orphan-files` / vacuum retention). */
  def sweepOrphans(root: String, graceMs: Long): Int = {
    val dataDir = new Path(s"$root/data")
    val fs = fsFor(dataDir)
    if (!fs.exists(dataDir)) 0
    else {
      val referenced = versions(root).flatMap(manifestFiles(root, _)).toSet
      val cutoff = System.currentTimeMillis() - graceMs
      var removed = 0
      fs.listStatus(dataDir).filter(_.isDirectory).foreach { batch =>
        val dataFiles = fs.listStatus(batch.getPath).filter(s =>
          s.isFile && s.getPath.getName.startsWith("part-") &&
            s.getPath.getName.endsWith(".parquet"))
        val orphans = dataFiles.filter(s =>
          !referenced.contains(s.getPath.toString) &&
            s.getModificationTime < cutoff)
        orphans.foreach { s => fs.delete(s.getPath, false); removed += 1 }
        // a dir whose EVERY data file was orphaned is a crashed batch:
        // remove it whole (markers like _SUCCESS go with it)
        if (orphans.nonEmpty && orphans.length == dataFiles.length)
          fs.delete(batch.getPath, true)
      }
      removed
    }
  }

  /** Read a snapshot: exactly the files its manifest lists (the
    * highest committed version when none is given). */
  def readSnapshot(spark: SparkSession, root: String,
                   version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(root))
    spark.read.parquet(manifestFiles(root, v): _*)
  }

  /** The files version `toV` ADDED over `fromV` (None = since the
    * beginning) — the append-only CHANGE FEED primitive: because data
    * files are immutable and an append commit only ever unions new
    * files in, the rows added between two versions are exactly the
    * rows of the added files, and a downstream consumer can process a
    * live table incrementally at O(delta) per poll instead of
    * re-reading O(table). NOT meaningful across a [[replace]] commit
    * (compaction/retraction rewrites files without adding rows) — a
    * consumer that must survive those needs a row-level changelog
    * (the q75 CDC tier), which is why table formats publish
    * "append-only" as a readable table property. */
  def addedFiles(root: String, fromV: Option[Int], toV: Int): Seq[String] = {
    val prev = fromV.map(manifestFiles(root, _).toSet).getOrElse(Set.empty)
    manifestFiles(root, toV).filterNot(prev)
  }

  /** Read `dir` as a catalog table when it has a committed manifest,
    * else as a plain parquet directory — the read seam that lets
    * artifact consumers (gate probes, scrub indexes) accept both a
    * catalog-managed index and a caller-staged plain dir. */
  def readTableOrDir(spark: SparkSession, dir: String): DataFrame =
    if (isTable(dir)) readSnapshot(spark, dir) else spark.read.parquet(dir)

  // ---- file-level min/max skipping (Iceberg-style manifest stats) ----

  private def statsPath(root: String, batch: String, col: String) =
    new Path(s"$root/data/$batch/_stats_$col.txt")

  /** Record per-file [min, max] of a long column for an already-staged
    * batch, read from the PARQUET FOOTERS — zero data scan; the same
    * numbers the writer already paid for. Stored as a per-batch sidecar
    * (`_stats_<col>.txt`, one `path \t min \t max` line per file), the
    * manifest-stats idea at batch granularity: a pruned read consults
    * one small sidecar per batch instead of one footer per data file.
    * Files whose footer lacks stats for the column are omitted — the
    * pruned read keeps them (skipping is an optimization, never a
    * correctness gate). */
  def writeColumnStats(root: String, batch: String, col: String,
                       files: Seq[String]): Unit = {
    val conf = hadoopConf
    val lines = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(f), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val perBlock = reader.getFooter.getBlocks.asScala.flatMap { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == col)
            .flatMap { c =>
              val st = c.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  Some((mn.longValue(), mx.longValue()))
                case _ => None
              }
            }
        }
        if (perBlock.isEmpty) None
        else Some(s"$f\t${perBlock.map(_._1).min}\t${perBlock.map(_._2).max}")
      } finally reader.close()
    }
    val p = statsPath(root, batch, col)
    writeUtf8(fsFor(p), p, lines.mkString("\n") + "\n")
  }

  /** Read a snapshot restricted to files whose recorded [min, max] for
    * `col` intersects [lo, hi] — file skipping from batch-sidecar stats,
    * no footer or data IO for skipped files. Files with no recorded
    * stats are conservatively KEPT. Returns (frame, files read, files
    * in the snapshot). The caller still applies its own row predicate:
    * skipping prunes FILES, the filter prunes rows within kept files. */
  def readSnapshotPruned(spark: SparkSession, root: String, col: String,
                         lo: Long, hi: Long,
                         version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.getOrElse(latestVersion(root))
    val files = manifestFiles(root, v)
    val stats: Map[String, (Long, Long)] = files
      .map(f => new Path(f).getParent.getName).distinct
      .flatMap { batch =>
        val p = statsPath(root, batch, col)
        val fs = fsFor(p)
        if (!fs.exists(p)) Seq.empty
        else readUtf8(fs, p).linesIterator.filter(_.nonEmpty).map { l =>
          val Array(path, mn, mx) = l.split("\t")
          path -> (mn.toLong, mx.toLong)
        }.toSeq
      }.toMap
    val kept = files.filter { f =>
      stats.get(f) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true // no stats -> never skip
      }
    }
    val df =
      if (kept.isEmpty)
        readSnapshot(spark, root, Some(v)).limit(0) // schema-stable empty
      else spark.read.parquet(kept: _*)
    (df, kept.size, files.size)
  }

  private def readUtf8(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def writeUtf8(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8"))
    finally out.close()
  }
}
