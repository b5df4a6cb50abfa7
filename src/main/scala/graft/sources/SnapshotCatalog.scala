package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-isolated table catalog over plain parquet — the
  * table-format seam (Iceberg/Delta-style) expressed with nothing but
  * files and atomic renames, so the ENGINE-side semantics (atomic
  * publish, snapshot isolation, time travel, file-level reuse across
  * versions) are implemented and testable without a format dependency.
  *
  * Layout under a table root:
  * {{{
  *   <root>/data/<batch>/part-*.parquet    immutable data files
  *   <root>/manifests/manifest-v<N>.txt    one absolute file path per line
  *   <root>/manifests/latest               current version number
  * }}}
  *
  * Contract:
  *   - data files are IMMUTABLE once a manifest references them — a new
  *     version adds new files and a new manifest, never rewrites old
  *     files (so an in-flight reader of v1 is never torn by a v2 commit);
  *   - a commit is two atomic renames (manifest, then pointer): readers
  *     resolve either the old or the new version, never a partial list;
  *   - time travel = reading an old manifest, which stays valid until an
  *     explicit expire/GC (not implemented — the reference point is the
  *     snapshot-expiry job every table format ships separately).
  *
  * At 100 TB this is the shape that makes compaction (src09), partition
  * corrections (src10), and streaming appends (st24) safe under
  * concurrent readers: writers stage files, then swap a pointer; on an
  * object store the rename pair becomes a conditional PUT, with the same
  * reader-visible semantics.
  */
object SnapshotCatalog {

  /** Write `df` as an immutable data batch under the table root;
    * returns the batch's data-file paths (sorted, absolute). */
  def writeData(df: DataFrame, root: String, batch: String): Seq[String] = {
    val path = s"$root/data/$batch"
    df.write.mode("overwrite").parquet(path)
    listDataFiles(path)
  }

  def listDataFiles(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq

  /** Atomically publish version `v` with exactly `files`: manifest lands
    * via tmp-write + rename, then the `latest` pointer swaps. A reader
    * that raced the commit sees either v−1's manifest+pointer or v's —
    * never a partially written file list. */
  def commit(root: String, v: Int, files: Seq[String]): Unit = {
    val mdir = new java.io.File(s"$root/manifests")
    require(mdir.isDirectory || mdir.mkdirs(), s"cannot create $mdir")
    val tmp = new java.io.File(mdir, s".manifest-v$v.tmp")
    java.nio.file.Files.write(tmp.toPath,
      (files.mkString("\n") + "\n").getBytes("UTF-8"))
    val fin = new java.io.File(mdir, s"manifest-v$v.txt")
    require(tmp.renameTo(fin), s"manifest publish failed: $tmp -> $fin")
    val ptmp = new java.io.File(mdir, ".latest.tmp")
    java.nio.file.Files.write(ptmp.toPath, v.toString.getBytes("UTF-8"))
    // ATOMIC pointer replace — delete-then-rename would leave a crash
    // window with no pointer at all (and a later commit would then
    // restart the version numbering over existing manifests)
    java.nio.file.Files.move(ptmp.toPath,
      new java.io.File(mdir, "latest").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def latestVersion(root: String): Int =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$root/manifests/latest").toPath), "UTF-8").trim.toInt

  /** Latest version, or None before the first commit. */
  def latestVersionOption(root: String): Option[Int] =
    if (new java.io.File(s"$root/manifests/latest").exists())
      Some(latestVersion(root))
    else None

  def manifestFiles(root: String, v: Int): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$root/manifests/manifest-v$v.txt").toPath), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq

  /** Read a snapshot: exactly the files its manifest lists (the
    * `latest` pointer's version when none is given). */
  def readSnapshot(spark: SparkSession, root: String,
                   version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(root))
    spark.read.parquet(manifestFiles(root, v): _*)
  }
}
