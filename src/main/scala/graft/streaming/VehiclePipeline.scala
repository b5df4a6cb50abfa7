package graft.streaming

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.multimodal.ImageCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** st25 — the reference's vehicle-counting lifecycle as ONE streaming
  * query (vehicle_consumer.py:58-243, SURVEY §3.2 entry point B):
  * Kafka-contract JSON frame messages → `from_json` parse → base64 →
  * REAL PNG decode (`javax.imageio`) → per-frame detection → `explode`
  * → watermarked 10-minute per-camera/type windows → idempotent JDBC
  * sink (embedded Derby standing in for Postgres, with explicit
  * Postgres-style DDL types) → the database table read back as the
  * query result.
  *
  * Differences from the reference, each deliberate:
  *   - its mock detector is `random.randint` (vehicle_consumer.py:104);
  *     ours derives counts from the DECODED image's channel sums, so it
  *     is deterministic (oracle-checkable) AND still proves the decode
  *     really ran — a stubbed codec cannot reproduce the closed-form
  *     sums;
  *   - its sink appends raw exploded detections and lets the dashboard
  *     aggregate (vehicle_counting_app.py:38-47); ours aggregates
  *     BEFORE the database — at 100 TB the windowed agg is the only
  *     shape that keeps the JDBC edge (a single-writer bottleneck) at
  *     O(windows × cameras × types) rows instead of O(frames);
  *   - its append is at-least-once (duplicates on replay); ours runs
  *     the idempotent delete-then-append sink, so crash replays
  *     converge to exactly-once table contents.
  *
  * Scale notes: frames move as one base64 column inside a JSON value —
  * the Kafka record contract — and the decode kernel is a typed
  * `mapPartitions` that parallelizes per partition (a production topic
  * arrives many-partition; the staged topic is range-split the same
  * way). The windowed agg shuffles counts, never pixels.
  */
object VehiclePipeline extends QueryPack {

  private[streaming] val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** All frame times hang off one fixed instant (frame k = base + k
    * seconds) so window boundaries are deterministic for the oracle. */
  val baseEpoch: Long =
    java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond

  /** The Kafka value contract — the reference producer's JSON message
    * shape (video_producer.py:93-106), frame payload base64-PNG. */
  def frameJson(id: Long): String = {
    val b64 = java.util.Base64.getEncoder.encodeToString(ImageCodec.encodePng(id))
    s"""{"camera_id":"cam_${id % 4}","frame_number":$id,""" +
      s""""timestamp":${baseEpoch + id},"frame":"$b64",""" +
      s""""width":${ImageCodec.specW(id)},"height":${ImageCodec.specH(id)}}"""
  }

  /** Watermark-advancing sentinel (st05's flush protocol): a far-future
    * frame on a camera the readback filters out. */
  def sentinelJson(tsEpoch: Long): String = {
    val b64 = java.util.Base64.getEncoder.encodeToString(ImageCodec.encodePng(0L))
    s"""{"camera_id":"__flush__","frame_number":-1,"timestamp":$tsEpoch,""" +
      s""""frame":"$b64","width":${ImageCodec.specW(0L)},"height":${ImageCodec.specH(0L)}}"""
  }

  /** Deterministic detection from the decoded channel sums. A vehicle
    * type is emitted only when present (cnt > 0) — the reference's
    * vehicle_counts dict carries only detected classes
    * (vehicle_consumer.py:140-157). Confidence is e4-integer (Canon
    * float policy); 'car' is always present so every frame detects. */
  def detections(sr: Long, sg: Long, sb: Long): Seq[VehicleDetection] =
    Seq(("car", 1 + sr % 3, 0L), ("motorcycle", (sr + sg) % 3, 1L),
        ("bus", sg % 2, 2L), ("truck", sb % 2, 3L))
      .collect { case (t, cnt, idx) if cnt > 0 =>
        VehicleDetection(t, 7000L + (sb + idx * 977L) % 3000L, cnt) }

  val frameSchema: StructType = StructType(Seq(
    StructField("camera_id", StringType), StructField("frame_number", LongType),
    StructField("timestamp", LongType), StructField("frame", StringType),
    StructField("width", IntegerType), StructField("height", IntegerType)))

  /** Parse Kafka-contract records and run the decode+detect kernel —
    * shared verbatim by the streaming query and the spec's batch twin
    * (stream ≡ batch is exactly this function under two executions). */
  def detectFrames(records: DataFrame): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.select(from_json(col("value"), frameSchema).as("d"))
      .select(col("d.camera_id"), col("d.timestamp"),
        unbase64(col("d.frame")).as("png"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions(_.map { case (cam, ts, png) =>
        val (sr, sg, sb) = ImageCodec.decodeChannelSums(png)
        FrameDetections(cam, ts, detections(sr, sg, sb))
      })
      .toDF()
  }

  /** explode(detections) → watermarked tumbling windows per
    * camera × vehicle type — the vehicle_consumer.py:171-183 explode
    * plus the dashboard's aggregation, fused pre-sink. */
  def windowedCounts(frames: DataFrame): DataFrame =
    frames.select(col("camera_id"),
        timestamp_seconds(col("ts_epoch")).as("ts"),
        explode(col("detections")).as("det"))
      .select(col("camera_id"), col("ts"),
        col("det.vehicle_type").as("vehicle_type"),
        col("det.conf_e4").as("conf_e4"), col("det.cnt").as("cnt"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("camera_id"),
        col("vehicle_type"))
      .agg(count(lit(1)).as("n_frames"), sum(col("cnt")).as("n_vehicles"),
        sum(col("conf_e4")).as("sum_conf_e4"))
      .select(unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("camera_id"), col("vehicle_type"),
        col("n_frames"), col("n_vehicles"), col("sum_conf_e4"))

  /** Stage the frame topic: one Kafka-contract (key, value) row per
    * document, range-split into nFiles time-slices with forced mtime
    * order (same rationale as Streams.stageEventsFresh — the file
    * source processes (mtime, path)-ordered). */
  def stageFrames(spark: SparkSession, dir: String, nFiles: Int = 4): String = {
    import spark.implicits._
    val out = Streams.dataDir("graft_frames_stage_")
    Tables(spark, dir).documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map(id => (s"cam_${id % 4}", frameJson(id), id)))
      .toDF("key", "value", "doc_id")
      .repartitionByRange(nFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select("key", "value")
      .write.mode("overwrite").parquet(out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val base = System.currentTimeMillis() - 3600000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 10000L) }
    out
  }

  /** Run the full pipeline against a fresh Derby database and return
    * (readback table, jdbc url) — the spec reuses this to inspect the
    * physical table the query leaves behind. */
  def runPipeline(spark: SparkSession, dir: String): (DataFrame, String) = {
    import spark.implicits._
    val staged = stageFrames(spark, dir)
    val url = s"jdbc:derby:${Streams.dataDir("graft_derby_veh_")}/db;create=true"
    val sink = JdbcBatchSink(url, "vehicle_counts",
      Map("driver" -> derbyDriver,
        // explicit DDL types, the reference's Postgres column shapes
        // (VEHICLE_COUNTING_GUIDE.md:107-118); also keeps Derby from
        // defaulting StringType to CLOB, which rejects predicates
        "createTableColumnTypes" ->
          "camera_id VARCHAR(32), vehicle_type VARCHAR(16)"),
      Streams.scratchDir("graft_cp_st25_"), idempotent = true)
    Streams.withStreamShufflePartitions(spark) {
      val stream = Streams.streamFromStaged(spark, staged, maxFilesPerTrigger = 1)
      val q = sink.start(windowedCounts(detectFrames(stream)))
      Streams.awaitDrained(q)
      // two flush kicks (st05 protocol): #1 advances the watermark past
      // every real window, #2 forces the micro-batch that emits under it
      Seq(1000000000L, 2000000000L).foreach { off =>
        Seq(("__flush__", sentinelJson(baseEpoch + off))).toDF("key", "value")
          .coalesce(1).write.mode("append").parquet(staged)
        Streams.awaitDrained(q)
      }
      q.stop()
    }
    val table = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "vehicle_counts")
      .option("driver", derbyDriver).load()
    (table, url)
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "st25_vehicle_pipeline",
      (spark, dir) => {
        val (table, _) = runPipeline(spark, dir)
        table
          .filter(col("camera_id") =!= "__flush__")
          .select(col("window_start_epoch"), col("camera_id"),
            col("vehicle_type"), col("n_frames"), col("n_vehicles"),
            col("sum_conf_e4"))
      },
      Some("""WITH f AS (SELECT doc_id,
             |    CAST(16 + doc_id % 48 AS BIGINT) AS w,
             |    CAST(16 + doc_id % 32 AS BIGINT) AS h,
             |    CAST(doc_id % 97 AS BIGINT) AS c
             |  FROM documents),
             |s AS (SELECT doc_id,
             |    h*(w*c + (w*(w-1))//2) AS sum_r,
             |    w*(h*c + (h*(h-1))//2) AS sum_g,
             |    w*h*c + h*((w*(w-1))//2) + w*((h*(h-1))//2) AS sum_b
             |  FROM f),
             |det AS (SELECT doc_id, t.vehicle_type,
             |    CASE t.vehicle_type
             |      WHEN 'car' THEN 1 + sum_r % 3
             |      WHEN 'motorcycle' THEN (sum_r + sum_g) % 3
             |      WHEN 'bus' THEN sum_g % 2
             |      ELSE sum_b % 2 END AS cnt,
             |    7000 + (sum_b + t.t_idx * 977) % 3000 AS conf_e4
             |  FROM s CROSS JOIN (VALUES ('car', 0), ('motorcycle', 1),
             |    ('bus', 2), ('truck', 3)) t(vehicle_type, t_idx))
             |SELECT
             |  600 * ((CAST(epoch(TIMESTAMP '2026-03-01 00:00:00') AS BIGINT) + doc_id) // 600)
             |    AS window_start_epoch,
             |  'cam_' || CAST(doc_id % 4 AS VARCHAR) AS camera_id,
             |  vehicle_type,
             |  count(*) AS n_frames,
             |  CAST(sum(cnt) AS BIGINT) AS n_vehicles,
             |  CAST(sum(conf_e4) AS BIGINT) AS sum_conf_e4
             |FROM det
             |WHERE cnt > 0
             |GROUP BY 1, 2, 3""".stripMargin),
      "Flagship lifecycle: frames → REAL decode → detect → explode → windowed agg → idempotent JDBC (vehicle_consumer.py:58-243)"))
}

final case class VehicleDetection(vehicle_type: String, conf_e4: Long, cnt: Long)
final case class FrameDetections(camera_id: String, ts_epoch: Long,
                                 detections: Seq[VehicleDetection])
