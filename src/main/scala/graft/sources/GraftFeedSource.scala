package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `spark.readStream` SOURCE over a snapshot-catalog table's change
  * feed — the Delta streaming-source shape: offsets are LOG VERSIONS,
  * each micro-batch reads exactly the files the versions in its range
  * ADDED (O(delta) per batch — the table is never rescanned), and the
  * st39 consumer contract surfaces as STREAM SEMANTICS:
  *
  *   - a REPLACE/compaction (or any row-level delete) inside a polled
  *     range FAILS THE QUERY loudly — an adds-only fold across a
  *     rewrite would double-count survivors (or keep serving deleted
  *     rows); the operator restarts with a fresh checkpoint and the
  *     source re-baselines from the full snapshot;
  *   - a range that fell off the retention horizon (expired commits)
  *     fails the same way — the poll horizon must stay inside the
  *     vacuum window;
  *   - the FIRST batch of a fresh checkpoint is the bootstrap: the
  *     complete current snapshot (refused loudly if deletion vectors
  *     are in effect — an adds-only bootstrap would serve deleted
  *     rows), after which batches are incremental.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft-feed")                      // or the class name
  *     .option("root", "/data/warehouse/db/t")
  *     .option("maxVersionsPerTrigger", "1")      // rate limit
  *     .option("startingVersion", "7")            // or "latest":
  *     .load()                                    // incremental from v7,
  *                                                // skipping the bootstrap
  * }}}
  *
  * Hive-partitioned tables serve their partition columns reconstructed
  * from the file paths (the same values the serve path casts).
  * Replayed batches are exactly-once per the normal micro-batch
  * contract: the (start, end] version range rides the checkpoint, and
  * a recovered batch re-reads exactly the same immutable files. */
class GraftFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-feed"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("root",
      sys.error("graft-feed needs .option(\"root\", <table root>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val spark = sqlContext.sparkSession
    val v = SnapshotCatalog.latestVersion(root)
    val (data, part) = SnapshotFileIndex.servedSchemas(spark, root, v)
    ("graft-feed", StructType(data.fields ++ part.fields))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val maxPer = parameters.get("maxVersionsPerTrigger").map(_.toInt)
      .getOrElse(Int.MaxValue)
    require(maxPer >= 1, "maxVersionsPerTrigger must be >= 1")
    val root = rootOf(parameters)
    // Delta-parity startingVersion: a FRESH checkpoint begins serving
    // INCREMENTALLY from this version (inclusive) instead of the
    // full-snapshot bootstrap; "latest" = only future commits
    val startingBase = parameters.get("startingVersion").map {
      case "latest" => SnapshotCatalog.latestVersion(root).toLong
      case n => n.toLong - 1L
    }
    new GraftFeedSource(sqlContext.sparkSession, root, maxPer,
      metadataPath, startingBase)
  }
}

class GraftFeedSource(spark: SparkSession, root: String,
                      maxVersionsPerTrigger: Int, metadataPath: String,
                      startingBase: Option[Long] = None)
    extends Source {

  override val schema: StructType = {
    val v = SnapshotCatalog.latestVersion(root)
    val (data, part) = SnapshotFileIndex.servedSchemas(spark, root, v)
    StructType(data.fields ++ part.fields)
  }

  /** Highest version already handed out via [[getOffset]]/[[getBatch]]
    * — the rate-limit base. PERSISTED under the source's checkpoint-
    * scoped metadataPath (atomic tmp+rename): a RESTARTED query must
    * not see this reset to 0 — `getOffset` would then report an offset
    * BELOW the engine's committed one, regress it, and re-deliver an
    * already-processed version on the climb back up. A fresh
    * checkpoint has no watermark file, which is exactly the bootstrap
    * case. */
  private val hwmPath = {
    val p = new Path(metadataPath, "graft-feed-hwm")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p.getParent)) fs.mkdirs(p.getParent)
    p
  }

  @volatile private var servedThrough: Long = {
    val fs = hwmPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hwmPath)) startingBase.getOrElse(0L)
    else try {
      val in = fs.open(hwmPath)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](64)
        var n = in.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
        new String(buf.toByteArray, "UTF-8").trim.toLong
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => 0L }
  }

  private def advanceServed(v: Long): Unit = if (v > servedThrough) {
    servedThrough = v
    val fs = hwmPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(hwmPath.getParent, s".${hwmPath.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(hwmPath, false)
    fs.rename(tmp, hwmPath)
    ()
  }

  private def toVersion(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().toLong
  }

  override def getOffset: Option[Offset] = {
    val latest = SnapshotCatalog.latestVersionOption(root).map(_.toLong)
    latest.map { l =>
      val capped = math.min(l, servedThrough + maxVersionsPerTrigger)
      LongOffset(math.max(capped, servedThrough))
    }.filter(_.offset > 0L)
  }

  override def commit(end: Offset): Unit = advanceServed(toVersion(end))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // a fresh checkpoint's first batch has no start offset: with a
    // startingVersion the range is INCREMENTAL from that base
    // (inclusive of the base version's own commit); without one it is
    // the full-snapshot bootstrap
    val from = start.map(toVersion).orElse(startingBase)
    val to = toVersion(end)
    advanceServed(math.max(from.getOrElse(0L), to))
    // addedFiles IS the contract: O(delta) commit reads for an
    // incremental range, the full manifest for a bootstrap, and a loud
    // IllegalStateException across a rewrite/delete or past retention
    val files =
      if (from.exists(_ >= to)) Seq.empty
      else SnapshotCatalog.addedFiles(root, from.map(_.toInt), to.toInt)
    if (from.isEmpty && SnapshotCatalog.dvFiles(root, to.toInt).nonEmpty)
      throw new IllegalStateException(
        s"graft-feed bootstrap of $root at version $to: deletion vectors " +
          "are in effect — an adds-only bootstrap would serve deleted " +
          "rows; compact the table (OPTIMIZE applies and resets DVs) " +
          "and restart")
    val spec = SnapshotCatalog.partitionSpecAt(root, to.toInt)
    val dataSchema = StructType(schema.fields.filterNot(f =>
      spec.exists(_.fieldNames.contains(f.name))))
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (files.isEmpty) {
      // a metadata-only range: an empty STREAMING frame of this schema
      org.apache.spark.sql.graftbridge.Bridge.emptyStreamingDF(spark, schema)
    } else {
      val index = new InMemoryFileIndex(
        classic, files.map(new Path(_)), Map.empty, Some(dataSchema))
      val relation = HadoopFsRelation(
        location = index,
        partitionSchema = StructType(Nil),
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(classic)
      val base = org.apache.spark.sql.graftbridge.Bridge.ofRows(
        spark, LogicalRelation(relation, isStreaming = true))
      spec.fold(base)(sp => SnapshotCatalog.reconstructPartCols(base, sp))
        .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftFeedSource[$root]"
}
