package graft.multimodal

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column pack (north star): treat image/audio/video payloads
  * as opaque `binary` columns with typed metadata.
  *
  * The reference moves base64-JPEG frames through string columns end to
  * end (video_producer.py:93-94 encode → vehicle_consumer.py:94-96 decode
  * → fire_consumer_streaming.py:205-206 re-encode). The engine's model is
  * stronger: BinaryType columns + deterministic metadata extraction. The
  * decode step itself is STUBBED (no image libs in this container) behind
  * `FrameFeatures.decodeStub` — the Spark-side plumbing (schema, typed
  * Dataset batch shape, partitioning) is real and oracle-tested.
  */
object MultimodalQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "mm01_binary_meta",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Binary payload plumbing: bytes, content hash, header slice —
        // exactly what a real image-metadata pass computes per blob.
        val bin = t.documents.select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        bin.select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha256"),
          regexp_replace(base64(substring(col("payload"), 1, 12)), "[\\r\\n]", "")
            .as("header_b64"))
      },
      Some("""SELECT doc_id,
             |  octet_length(payload) AS n_bytes,
             |  sha256(text) AS sha256,
             |  to_base64(substring(text, 1, 12)::BLOB) AS header_b64
             |FROM (SELECT doc_id, text, text::BLOB AS payload FROM documents)""".stripMargin),
      "North star: binary column metadata (bytes/hash/header) — frame payload shape"),

    GraftQuery(
      "mm02_frame_sample",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Frame sampling: keep every 5th event per user by time — the
        // video_producer.py:83-90 frame-skip recast as a distributed
        // window. One shuffle on user_id; no global sort.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t.events
          .withColumn("rn", row_number().over(w))
          .filter((col("rn") - 1) % 5 === 0)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sampled"),
               max(col("rn")).as("last_rn"))
      },
      Some("""SELECT user_id, count(*) AS n_sampled, max(rn) AS last_rn
             |FROM (SELECT user_id,
             |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |      FROM events)
             |WHERE (rn - 1) % 5 = 0
             |GROUP BY user_id""".stripMargin),
      "North star: every-Nth frame sampling per stream (video_producer.py:83-90)"),

    GraftQuery(
      "mm03_decode_features",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Typed-Dataset decode pipeline: binary payload → case-class
        // features via mapPartitions (the U3/U4 struct-returning contract;
        // Scala equivalent of the reference's batched pandas_udf). The
        // "decode" is FrameFeatures.decodeStub — deterministic fake.
        val bin = t.documents
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        bin.mapPartitions(_.map { case (id, payload) =>
          FrameFeatures.decodeStub(id, payload)
        }).toDF()
      },
      Some("""SELECT doc_id,
             |  octet_length(text::BLOB) AS n_bytes,
             |  CAST(octet_length(text::BLOB) % 640 AS INTEGER) AS width,
             |  CAST(octet_length(text::BLOB) % 480 AS INTEGER) AS height,
             |  3 AS channels,
             |  CAST(floor(ascii(substring(text, 1, 1)) / 64) * 64 AS INTEGER) AS luma_stub
             |FROM documents""".stripMargin),
      "North star: stubbed decode/feature-extract via typed mapPartitions batch"),

    GraftQuery(
      "mm04_resize_batch",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Batched resize plumbing: payloads flow through mapPartitions in
        // groups of 64 — the Scala shape of a vectorized (pandas-style)
        // UDF, where a real implementation hands each batch to a native
        // resize library in one call. The geometry math (fit-to-224,
        // aspect preserved, integer-exact) is real; only the pixel work
        // is the deterministic stub. Zero shuffles — pure projection.
        val bin = t.documents
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        bin.mapPartitions(_.grouped(64).flatMap { batch =>
          // batch boundary = where the vectorized library call happens
          batch.map { case (id, payload) => FrameFeatures.resizeStub(id, payload) }
        }).toDF()
      },
      Some("""SELECT doc_id, in_w, in_h,
             |  CAST(CASE WHEN in_w >= in_h THEN 224
             |       ELSE floor(in_w * 224.0 / greatest(in_h, 1)) END AS INTEGER) AS out_w,
             |  CAST(CASE WHEN in_w >= in_h THEN floor(in_h * 224.0 / greatest(in_w, 1))
             |       ELSE 224 END AS INTEGER) AS out_h,
             |  CAST(floor(2240000.0 / greatest(in_w, in_h, 1)) AS BIGINT) AS scale_e4
             |FROM (
             |  SELECT doc_id,
             |    CAST(octet_length(text::BLOB) % 640 AS INTEGER) AS in_w,
             |    CAST(octet_length(text::BLOB) % 480 AS INTEGER) AS in_h
             |  FROM documents)""".stripMargin),
      "North star: batched resize plumbing (fit-to-224, vectorized-UDF batch shape)"))
}

/** Decoded frame features — the typed output contract of the decode stub. */
final case class DecodedFrame(doc_id: Long, n_bytes: Long, width: Int,
                              height: Int, channels: Int, luma_stub: Int)

object FrameFeatures {
  /** Deterministic stand-in for image decode (no codec libs in this
    * container). Real deployment swaps this body for an actual decoder;
    * the Dataset plumbing around it is unchanged. */
  def decodeStub(id: Long, payload: Array[Byte]): DecodedFrame = {
    val n = payload.length.toLong
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    DecodedFrame(id, n, (n % 640).toInt, (n % 480).toInt, 3, (b0 >> 6) << 6)
  }

  /** Deterministic stand-in for image resize: fit the stub geometry into
    * a 224×224 box preserving aspect ratio (integer-exact math; the
    * pixel resample itself is where a real library call goes). */
  def resizeStub(id: Long, payload: Array[Byte]): ResizedFrame = {
    val n = payload.length
    val w = n % 640
    val h = n % 480
    val (ow, oh) =
      if (w >= h) (224, h * 224 / math.max(w, 1))
      else (w * 224 / math.max(h, 1), 224)
    val scaleE4 = 2240000L / math.max(math.max(w, h), 1)
    ResizedFrame(id, w, h, ow, oh, scaleE4)
  }
}

/** Resized frame geometry — output contract of the resize stub. */
final case class ResizedFrame(doc_id: Long, in_w: Int, in_h: Int,
                              out_w: Int, out_h: Int, scale_e4: Long)
