package graft.multimodal

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column pack (north star): treat image/audio/video payloads
  * as opaque `binary` columns with typed metadata, and run REAL image
  * codecs (JDK `javax.imageio` — pure-JVM, no external jar) inside the
  * distributed kernels.
  *
  * The reference moves base64-JPEG frames through string columns end to
  * end (video_producer.py:93-94 encode → vehicle_consumer.py:94-96 decode
  * → fire_consumer_streaming.py:205-206 re-encode). The engine's model is
  * stronger: BinaryType columns + typed `Dataset` kernels that genuinely
  * encode and decode PNG/JPEG bytes. Verification story: each doc_id maps
  * to a deterministic gradient image (see [[ImageCodec]]); PNG is lossless,
  * so the per-channel pixel sums recovered by the REAL decoder must equal
  * the closed-form polynomial the DuckDB oracle computes from doc_id alone.
  * A stubbed or broken decoder cannot reproduce those sums.
  */
object MultimodalQueries extends QueryPack {

  /** Shared dHash near-dup mining (mm08 image / mm09 audio): band the
    * 64-bit fingerprint into 4×16-bit keys, pair within bands (linear
    * shuffle, no id×id), verify with the codegen `hamming_dist`. Input
    * contract: (id, dhash) with dhash a 64-char bit-string. */
  private def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int = 4): DataFrame = {
    val bands = hashes.select(col("id"), col("dhash"),
      posexplode(array((0 until 4).map(i =>
        substring(col("dhash"), i * 16 + 1, 16)): _*)))
      .toDF("id", "dhash", "band_id", "bv")
    val a = bands.select(col("band_id"), col("bv"),
      col("id").as("id_a"), col("dhash").as("ha"))
    val b = bands.select(col("band_id"), col("bv"),
      col("id").as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("band_id", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ha"), col("hb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        graft.functions.HammingDistance.hammingDist(col("ha"), col("hb"))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

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
        // REAL decode pipeline: each doc_id is rendered to actual PNG and
        // JPEG bytes (ImageIO.write) in stage 1, carried as a BinaryType
        // column, then decoded back (ImageIO.read) in stage 2 — the same
        // encode→transport→decode path as the reference's camera frames
        // (vehicle_consumer.py:94-96), with real codecs on both ends.
        // PNG sums are oracle-exact (lossless); JPEG is verified on
        // geometry (exact) and mean-luma drift (|Δ| ≤ 8 of 255, lossy).
        // The codec kernel is CPU-bound: spread the (tiny) doc_id keys
        // across all cores first — the testdata table is a single
        // parquet file = one input partition, which would serialize all
        // encode/decode work on one thread. The shuffle moves longs
        // only; a production binary table already arrives many-partition.
        val payloads = t.documents
          .select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .mapPartitions(_.map { id =>
            (id, ImageCodec.encodePng(id), ImageCodec.encodeJpeg(id))
          })
          .toDF("doc_id", "png", "jpeg")
          .as[(Long, Array[Byte], Array[Byte])]
        payloads.mapPartitions(_.map { case (id, png, jpeg) =>
          ImageCodec.decodeFeatures(id, png, jpeg)
        }).toDF()
      },
      Some("""SELECT doc_id,
             |  CAST(w AS INTEGER) AS width,
             |  CAST(h AS INTEGER) AS height,
             |  3 AS channels,
             |  CAST(h * (w*c + (w*(w-1))//2) AS BIGINT) AS sum_r,
             |  CAST(w * (h*c + (h*(h-1))//2) AS BIGINT) AS sum_g,
             |  CAST(w*h*c + h*((w*(w-1))//2) + w*((h*(h-1))//2) AS BIGINT) AS sum_b,
             |  CAST(w AS INTEGER) AS jpeg_w,
             |  CAST(h AS INTEGER) AS jpeg_h,
             |  TRUE AS luma_ok
             |FROM (SELECT doc_id, 16 + doc_id % 48 AS w, 16 + doc_id % 32 AS h,
             |             doc_id % 97 AS c
             |      FROM documents)""".stripMargin),
      "North star: REAL PNG/JPEG decode via javax.imageio; lossless sums oracle-exact"),

    GraftQuery(
      "mm04_resize_batch",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // REAL batched resize: payloads flow through mapPartitions in
        // groups of 64 — the Scala shape of a vectorized (pandas-style)
        // UDF batch. Each image is decoded (ImageIO.read), resampled
        // bilinearly into a fit-to-224 box (Graphics2D), re-encoded to
        // PNG and decoded AGAIN — out_w/out_h come from the second real
        // decode, not from arithmetic. The only shuffle is the doc_id
        // spread below; the codec stages themselves are projections.
        // doc_id keys repartitioned before the codec stage (same
        // single-input-file consideration as mm03).
        val bin = t.documents
          .select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .map(id => (id, ImageCodec.encodePng(id)))
          .toDF("doc_id", "payload")
          .as[(Long, Array[Byte])]
        bin.mapPartitions(_.grouped(64).flatMap { batch =>
          // batch boundary = where a vectorized native call would happen
          batch.map { case (id, payload) => ImageCodec.resize224(id, payload) }
        }).toDF()
      },
      Some("""SELECT doc_id,
             |  CAST(w AS INTEGER) AS in_w,
             |  CAST(h AS INTEGER) AS in_h,
             |  CAST(CASE WHEN w >= h THEN 224 ELSE (w*224)//h END AS INTEGER) AS out_w,
             |  CAST(CASE WHEN w >= h THEN (h*224)//w ELSE 224 END AS INTEGER) AS out_h,
             |  CAST(2240000 // greatest(w, h) AS BIGINT) AS scale_e4,
             |  TRUE AS resample_ok
             |FROM (SELECT doc_id, 16 + doc_id % 48 AS w, 16 + doc_id % 32 AS h
             |      FROM documents)""".stripMargin),
      "North star: REAL bilinear resize (Java2D) in vectorized-UDF batch shape"),

    GraftQuery(
      "mm05_image_files",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // File-based image ingest: real PNG fixture FILES on disk, read
        // through Spark's `binaryFile` source (path/length/content), doc_id
        // parsed from the filename, content decoded by the REAL codec.
        // This is the S3 ingest seam: swap the fixture dir for an object
        // store of camera frames and nothing else changes.
        val fixDir = ImageCodec.ensureFixtureDir()
        val files = spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.png")
          .load(fixDir)
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
              .cast("long").as("doc_id"),
            col("content"))
        val decoded = files.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => ImageCodec.decodePng(id, bytes) })
          .toDF()
        // Inner-join with the table so small SFs (fewer than 64 docs)
        // stay consistent with the oracle's `doc_id < 64` predicate.
        decoded.join(t.documents.select("doc_id"), Seq("doc_id"))
          .orderBy(col("doc_id").asc)
      },
      Some("""SELECT doc_id,
             |  CAST(w AS INTEGER) AS width,
             |  CAST(h AS INTEGER) AS height,
             |  CAST(h * (w*c + (w*(w-1))//2) AS BIGINT) AS sum_r
             |FROM (SELECT doc_id, 16 + doc_id % 48 AS w, 16 + doc_id % 32 AS h,
             |             doc_id % 97 AS c
             |      FROM documents)
             |WHERE doc_id < 64
             |ORDER BY doc_id""".stripMargin),
      "North star: binaryFile ingest of real PNG fixtures + real decode"),

    GraftQuery(
      "mm06_audio_meta",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // REAL audio codec path (javax.sound.sampled — pure JDK): each
        // doc_id maps to a deterministic 16-bit mono PCM signal whose
        // frame count is a multiple of 256; the kernel encodes it to
        // actual RIFF/WAVE bytes (AudioSystem.write), carries them as a
        // binary column, then re-parses the container and decodes the
        // PCM stream back. Header fields AND full-stream sample sums
        // must match the closed forms the oracle computes from doc_id —
        // the (c + 7i) mod 256 sawtooth is a bijection on each 256-frame
        // period, so sums are period-exact and offset-independent.
        // doc_id keys repartitioned before the codec stage (same
        // single-input-file consideration as mm03).
        val payloads = t.documents
          .select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .map(id => (id, AudioCodec.encodeWav(id)))
          .toDF("doc_id", "wav")
          .as[(Long, Array[Byte])]
        payloads.mapPartitions(_.map { case (id, wav) =>
          AudioCodec.decodeMeta(id, wav)
        }).toDF()
      },
      Some("""SELECT doc_id,
             |  8000 AS sample_rate,
             |  1 AS channels,
             |  16 AS bits,
             |  CAST(n AS BIGINT) AS n_frames,
             |  CAST(-128 * n AS BIGINT) AS sum_pcm,
             |  CAST((n // 256) * 1398144 * 65536 AS BIGINT) AS sumsq_pcm
             |FROM (SELECT doc_id, 256 * (4 + doc_id % 8) AS n FROM documents)""".stripMargin),
      "North star: REAL WAV encode/decode via javax.sound — header + PCM sums oracle-exact"),

    GraftQuery(
      "mm07_video_frames",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Video-frame ingest (S3): the reference decodes mp4, skips to a
        // target FPS, and feature-extracts frames (video_producer.py:49-126).
        // No mp4 codec ships in the JDK, so the container is the engine's
        // MJPEG-style stand-in — length-prefixed REAL PNG frames — and
        // everything downstream is the real work: parse the binary
        // container frame by frame, keep every 2nd frame (the frame-skip),
        // decode kept frames with the REAL codec, and reduce to features.
        // Frame count, sample count and sampled channel sums must match
        // the closed forms the oracle derives from doc_id alone.
        val payloads = t.documents
          .select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .map(id => (id, ImageCodec.encodeVideo(id)))
          .toDF("doc_id", "container")
          .as[(Long, Array[Byte])]
        payloads.mapPartitions(_.map { case (id, container) =>
          ImageCodec.sampleFrames(id, container, every = 2)
        }).toDF()
      },
      Some("""SELECT doc_id,
             |  CAST(4 + doc_id % 4 AS INTEGER) AS n_frames,
             |  CAST((4 + doc_id % 4 + 1) // 2 AS INTEGER) AS n_sampled,
             |  CAST(sum(CASE WHEN k % 2 = 0
             |       THEN h * (w*c + (w*(w-1))//2) ELSE 0 END) AS BIGINT) AS sum_r_sampled
             |FROM (
             |  SELECT d.doc_id, t.k,
             |    16 + (d.doc_id*8 + t.k) % 48 AS w,
             |    16 + (d.doc_id*8 + t.k) % 32 AS h,
             |    (d.doc_id*8 + t.k) % 97 AS c
             |  FROM documents d, range(0, 8) t(k)
             |  WHERE t.k < 4 + d.doc_id % 4)
             |GROUP BY doc_id""".stripMargin),
      "North star: video container parse + every-Nth frame sample + REAL frame decode"),

    GraftQuery(
      "mm11_keyframes",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // SCENE-CHANGE KEYFRAME SELECTION — the frame-level dedup a
        // video training pipeline runs before captioning/embedding:
        // near-identical consecutive frames carry no new signal, so
        // only frames whose features MOVED survive (first frame +
        // >10 % relative red-sum change, integer-form). Same container
        // and REAL decode as mm07; the fixture frames' channel sums
        // are closed-form in doc_id, so the oracle replays selection —
        // including the lag comparison down each doc's frame axis —
        // from arithmetic alone. Scale shape: embarrassingly parallel
        // per container (mapPartitions, no shuffle at all); the decode
        // is the honest per-frame cost, shared with mm03/mm07.
        val payloads = t.documents
          .select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .map(id => (id, ImageCodec.encodeVideo(id)))
          .toDF("doc_id", "container")
          .as[(Long, Array[Byte])]
        payloads.mapPartitions(_.map { case (id, container) =>
          ImageCodec.keyframes(id, container)
        }).toDF()
      },
      Some("""WITH fr AS (
             |  SELECT d.doc_id, t.k,
             |    (16 + (d.doc_id*8 + t.k) % 32) *
             |    ((16 + (d.doc_id*8 + t.k) % 48) * ((d.doc_id*8 + t.k) % 97)
             |      + ((16 + (d.doc_id*8 + t.k) % 48) * (16 + (d.doc_id*8 + t.k) % 48 - 1)) // 2)
             |    AS r
             |  FROM documents d, range(0, 8) t(k)
             |  WHERE t.k < 4 + d.doc_id % 4),
             |lagged AS (
             |  SELECT doc_id, k, r,
             |    lag(r) OVER (PARTITION BY doc_id ORDER BY k) AS pr
             |  FROM fr),
             |flagged AS (
             |  SELECT doc_id, r,
             |    (pr IS NULL OR abs(r - pr) * 10 > pr) AS is_key
             |  FROM lagged)
             |SELECT doc_id,
             |  CAST(count(*) AS INTEGER) AS n_frames,
             |  CAST(sum(CASE WHEN is_key THEN 1 ELSE 0 END) AS INTEGER) AS n_keyframes,
             |  CAST(sum(CASE WHEN is_key THEN r ELSE 0 END) AS BIGINT) AS sum_r_key
             |FROM flagged GROUP BY doc_id""".stripMargin),
      "North star: scene-change keyframe selection — every frame REAL-decoded, lag-threshold pick, closed-form oracle"),

    GraftQuery(
      "mm08_image_neardup",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Image perceptual-hash near-dup (the d12 gap: the pipeline
        // decodes images but never fingerprints them). dHash over a REAL
        // codec roundtrip: each id renders a 9×8-block fixture image
        // (4×4-px constant blocks, gray values closed-form in id; ids
        // sharing a base differ only in planted perturbed blocks), is
        // PNG-encoded, decoded back, block-averaged to the 9×8 grid, and
        // hashed by adjacent-mean comparisons → a 64-bit fingerprint.
        // Mining is d09's shape: band the hash into 4×16-bit keys, pair
        // within bands (linear shuffle, no doc×doc), verify with the
        // codegen hamming_dist ≤ 4. PNG is lossless and blocks are
        // constant, so the block means — and therefore every hash bit —
        // are oracle-exact; the oracle replays the pipeline from the
        // closed-form gray values alone. A broken decode or resample
        // cannot reproduce the planted pair set.
        val hashes = t.documents.filter(col("doc_id") < 64).select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .mapPartitions(_.map { id =>
            (id, ImageCodec.dhashFromPng(ImageCodec.encodeBlockPng(id)))
          })
          .toDF("id", "dhash")
        dhashNearDupPairs(hashes)
      },
      Some({
        val g = MultimodalQueries.blockGraySql
        s"""WITH ids AS (SELECT doc_id AS id, doc_id // 4 AS base, doc_id % 4 AS variant
           |             FROM documents WHERE doc_id < 64),
           |eff AS (SELECT id, variant,
           |         CASE WHEN variant = 3 THEN base + 41 ELSE base END AS ebase FROM ids),
           |blocks AS (
           |  SELECT id, bxr.bx, byr.by,
           |    CASE WHEN (variant >= 1 AND bxr.bx = 2 AND byr.by = 1)
           |           OR (variant = 2 AND bxr.bx = 5 AND byr.by = 4)
           |    THEN 255 - $g ELSE $g END AS g
           |  FROM eff, (SELECT unnest(range(0, 9)) AS bx) bxr,
           |            (SELECT unnest(range(0, 8)) AS by) byr),
           |bits AS (
           |  SELECT a.id, a.by * 8 + a.bx AS b,
           |    CASE WHEN n.g > a.g THEN '1' ELSE '0' END AS bit
           |  FROM blocks a JOIN blocks n ON n.id = a.id AND n.by = a.by AND n.bx = a.bx + 1
           |  WHERE a.bx < 8),
           |hash AS (SELECT id, string_agg(bit, '' ORDER BY b) AS dhash FROM bits GROUP BY id),
           |band AS (SELECT id, dhash, bir.bi, substring(dhash, bir.bi*16 + 1, 16) AS bv
           |         FROM hash, (SELECT unnest(range(0, 4)) AS bi) bir),
           |cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.dhash AS ha, b.dhash AS hb
           |  FROM band a JOIN band b ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
           |SELECT id_a, id_b,
           |  CAST(list_sum(list_transform(range(1, 65),
           |    i -> CASE WHEN substring(ha, i, 1) <> substring(hb, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
           |FROM cand
           |WHERE hamming <= 4""".stripMargin
      }),

      "North star: image dHash near-dup — real codec roundtrip, banded mining, hamming verify"),

    GraftQuery(
      "mm09_audio_neardup",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Audio perceptual near-dup — mm08's dHash idea on the audio
        // axis: each id renders a 65-window constant-amplitude PCM
        // fixture (window values closed-form in id; ids sharing a base
        // differ only in planted inverted windows), is encoded to a
        // REAL WAV container, decoded back (RIFF parse + LE 16-bit
        // reconstruction), window-summed, and fingerprinted by adjacent
        // window comparisons → 64 bits. Mining is the same banded shape
        // (4×16-bit keys → linear shuffle), verified with the codegen
        // hamming_dist ≤ 4. Constant windows make every sum — and
        // therefore every hash bit — oracle-exact from doc_id alone; a
        // byte-order or header-offset bug cannot reproduce the planted
        // pair set.
        val hashes = t.documents.filter(col("doc_id") < 64).select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .mapPartitions(_.map { id =>
            (id, AudioCodec.audioDhash(AudioCodec.encodeNdWav(id)))
          })
          .toDF("id", "dhash")
        dhashNearDupPairs(hashes)
      },
      Some({
        val g = MultimodalQueries.windowValSql
        s"""WITH ids AS (SELECT doc_id AS id, doc_id // 4 AS base, doc_id % 4 AS variant
           |             FROM documents WHERE doc_id < 64),
           |eff AS (SELECT id, variant,
           |         CASE WHEN variant = 3 THEN base + 41 ELSE base END AS ebase FROM ids),
           |win AS (
           |  SELECT id, wr.w,
           |    CASE WHEN (variant >= 1 AND wr.w = 10) OR (variant = 2 AND wr.w = 40)
           |    THEN -($g) ELSE ($g) END AS v
           |  FROM eff, (SELECT unnest(range(0, 65)) AS w) wr),
           |bits AS (
           |  SELECT a.id, a.w AS b,
           |    CASE WHEN n.v > a.v THEN '1' ELSE '0' END AS bit
           |  FROM win a JOIN win n ON n.id = a.id AND n.w = a.w + 1
           |  WHERE a.w < 64),
           |hash AS (SELECT id, string_agg(bit, '' ORDER BY b) AS dhash FROM bits GROUP BY id),
           |band AS (SELECT id, dhash, bir.bi, substring(dhash, bir.bi*16 + 1, 16) AS bv
           |         FROM hash, (SELECT unnest(range(0, 4)) AS bi) bir),
           |cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.dhash AS ha, b.dhash AS hb
           |  FROM band a JOIN band b ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
           |SELECT id_a, id_b,
           |  CAST(list_sum(list_transform(range(1, 65),
           |    i -> CASE WHEN substring(ha, i, 1) <> substring(hb, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
           |FROM cand
           |WHERE hamming <= 4""".stripMargin
      }),
      "North star: audio dHash near-dup — real WAV roundtrip, windowed fingerprint, banded mining"),

    GraftQuery(
      "mm10_fire_struct",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // U4's distinctive shape: a struct-returning kernel whose image
        // field is emitted CONDITIONALLY — every 5th frame or on
        // detection (fire_consumer_streaming.py:146-219). mm03 covers
        // the decode; this pins the EMISSION POLICY: rows where neither
        // trigger fires must carry NULL for the (expensive) re-encoded
        // overlay, and rows where either fires must carry the real
        // re-encode's decoded red sum. See ImageCodec.fireDetect for
        // the full contract.
        t.documents.select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .as[Long]
          .mapPartitions(_.map { id =>
            ImageCodec.fireDetect(id, ImageCodec.encodePng(id))
          })
          .toDF()
      },
      Some("""WITH f AS (SELECT doc_id,
             |    CAST(16 + doc_id % 48 AS BIGINT) AS w,
             |    CAST(16 + doc_id % 32 AS BIGINT) AS h,
             |    CAST(doc_id % 97 AS BIGINT) AS c
             |  FROM documents),
             |m AS (SELECT doc_id, w, h, c,
             |    LEAST(w, 128 - c) AS k,
             |    h*(w*c + (w*(w-1))//2) AS sum_r
             |  FROM f),
             |e AS (SELECT doc_id, w, h, c, k,
             |    (10000 * h * (w - k)) // (w*h) AS fire_pct_e4,
             |    (10000 * sum_r) // (255*w*h) AS conf_e4
             |  FROM m)
             |SELECT doc_id,
             |  fire_pct_e4 > 100 AS fire_detected,
             |  fire_pct_e4,
             |  conf_e4,
             |  (doc_id % 5 = 0 OR fire_pct_e4 > 100) AS image_emitted,
             |  CASE WHEN doc_id % 5 = 0 OR fire_pct_e4 > 100
             |       THEN h*(k*c + (k*(k-1))//2) + 255*h*(w - k)
             |       ELSE NULL END AS overlay_sum_r
             |FROM e""".stripMargin),
      "North star: fire-struct contract — conditional overlay emission, real re-encode, oracle-exact"))

  /** Closed-form block gray value, SQL form (quadratic mix so distinct
    * ebase values are uncorrelated — a linear formula mod 200 makes
    * different bases mere constant shifts with IDENTICAL dHashes). Must
    * stay in lockstep with [[ImageCodec.blockGray]]. */
  private[multimodal] def blockGraySql: String =
    "(((((ebase + 1) * 2654435761 + (byr.by * 9 + bxr.bx + 1) * 40503) % 100003) * " +
      "(((ebase + 1) * 2654435761 + (byr.by * 9 + bxr.bx + 1) * 40503) % 100003)) % 200 + 20)"

  /** SQL twin of [[AudioCodec.windowVal]] (amplitude; the ×64-frame
    * window sum is a constant multiple, so comparisons are identical). */
  private[multimodal] def windowValSql: String =
    "(((((ebase + 1) * 2654435761 + (wr.w + 1) * 40503) % 100003) * " +
      "(((ebase + 1) * 2654435761 + (wr.w + 1) * 40503) % 100003)) % 200 - 100) * 256"
}

/** Features recovered by the REAL decoder — output contract of mm03. */
final case class DecodedImage(doc_id: Long, width: Int, height: Int,
                              channels: Int, sum_r: Long, sum_g: Long,
                              sum_b: Long, jpeg_w: Int, jpeg_h: Int,
                              luma_ok: Boolean)

/** Real-resize geometry, recovered by decoding the resized PNG (mm04). */
final case class ResizedImage(doc_id: Long, in_w: Int, in_h: Int,
                              out_w: Int, out_h: Int, scale_e4: Long,
                              resample_ok: Boolean)

/** PNG-file decode record (mm05). */
final case class FileImage(doc_id: Long, width: Int, height: Int, sum_r: Long)

/** mm10 output row — the reference's detect_fire_udf struct
  * (fire_consumer_streaming.py:145-150) with e4-integer percentages and
  * the conditional image field reported as its decoded red-channel sum
  * (None ⇔ the reference's image_data = null). */
final case class FireDetection(doc_id: Long, fire_detected: Boolean,
                               fire_pct_e4: Long, conf_e4: Long,
                               image_emitted: Boolean,
                               overlay_sum_r: Option[Long])

/** Frame-sampling features from a parsed video container (mm07). */
final case class VideoSample(doc_id: Long, n_frames: Int, n_sampled: Int,
                             sum_r_sampled: Long)

/** Scene-change keyframe selection over a parsed container (mm11). */
final case class VideoKeyframes(doc_id: Long, n_frames: Int,
                                n_keyframes: Int, sum_r_key: Long)

/** Audio metadata recovered by the REAL WAV decoder (mm06). */
final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, n_frames: Long, sum_pcm: Long,
                           sumsq_pcm: Long)

/** Deterministic PCM fixtures + REAL JDK WAV codec (`javax.sound.sampled`).
  *
  * Fixture spec — all pure functions of doc_id:
  *   n = 256·(4 + id%8) frames (1024..2816), 8 kHz mono 16-bit signed LE
  *   frame(i) = (((c + 7i) mod 256) − 128)·256, c = id%97
  * gcd(7, 256) = 1, so over each 256-frame period (c + 7i) mod 256 is a
  * bijection onto 0..255 regardless of c, giving period-exact sums:
  *   sum_pcm   = −128·n
  *   sumsq_pcm = (n/256)·1398144·65536   (Σ_{j=−128}^{127} j² = 1398144)
  * A real decode (RIFF parse + LE PCM reconstruction) must reproduce
  * these exactly; a broken byte order or header offset cannot. */
object AudioCodec {
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

  val SampleRate = 8000f

  def specFrames(id: Long): Int = 256 * (4 + (id % 8).toInt)

  /** Raw little-endian 16-bit PCM for a doc_id. */
  def renderPcm(id: Long): Array[Byte] = {
    val n = specFrames(id)
    val c = (id % 97).toInt
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((c + 7 * i) % 256) - 128) * 256
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** REAL WAV container encode via AudioSystem.write. */
  def encodeWav(id: Long): Array[Byte] = {
    val pcm = renderPcm(id)
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false) // signed, LE
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, pcm.length / 2)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** mm06 kernel: REAL RIFF parse + PCM decode of the WAV payload. */
  def decodeMeta(id: Long, wav: Array[Byte]): AudioMeta = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    try {
      val fmt = in.getFormat
      val nFrames = in.getFrameLength
      val bytes = in.readAllBytes()
      var (sum, sumsq) = (0L, 0L)
      var i = 0
      while (i + 1 < bytes.length) {
        // little-endian signed 16-bit reconstruction
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
        sum += s; sumsq += s * s
        i += 2
      }
      AudioMeta(id, fmt.getSampleRate.toInt, fmt.getChannels,
        fmt.getSampleSizeInBits, nFrames, sum, sumsq)
    } finally in.close()
  }

  // ---- mm09 near-dup fixtures: 65 constant-value windows × 64 frames ----
  val NdWindows = 65
  val NdWinLen = 64

  /** Closed-form window amplitude (quadratic mix like ImageCodec
    * .blockGray, so distinct bases are uncorrelated; ×256 keeps it well
    * inside 16-bit). Lockstep with mm09's oracle SQL. */
  def windowVal(ebase: Long, w: Int): Int = {
    val m = ((ebase + 1) * 2654435761L + (w + 1) * 40503L) % 100003L
    (((m * m) % 200 - 100) * 256).toInt
  }

  /** Effective window value after the planted-variant rules: ids share a
    * base per 4; variants 1/2 invert planted windows (near-dups of
    * variant 0), variant 3 re-bases (NOT a near-dup). */
  def ndVal(id: Long, w: Int): Int = {
    val base = id / 4
    val variant = id % 4
    val ebase = if (variant == 3) base + 41 else base
    val v = windowVal(ebase, w)
    if ((variant >= 1 && w == 10) || (variant == 2 && w == 40)) -v else v
  }

  /** REAL WAV encode of the near-dup fixture signal. */
  def encodeNdWav(id: Long): Array[Byte] = {
    val n = NdWindows * NdWinLen
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ndVal(id, i / NdWinLen)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** mm09 kernel: REAL RIFF parse + PCM decode → per-window sums →
    * 64-bit adjacent-comparison fingerprint (audio dHash). Windows are
    * constant-valued, so sums (∝ means) are integer-exact and every
    * hash bit is closed-form replayable. */
  def audioDhash(wav: Array[Byte]): String = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    val bytes = try in.readAllBytes() finally in.close()
    val sums = new Array[Long](NdWindows)
    var i = 0
    while (i + 1 < bytes.length) {
      val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
      sums(i / 2 / NdWinLen) += s
      i += 2
    }
    val sb = new StringBuilder(NdWindows - 1)
    var w = 0
    while (w < NdWindows - 1) {
      sb.append(if (sums(w + 1) > sums(w)) '1' else '0')
      w += 1
    }
    sb.toString
  }
}

/** Deterministic image fixtures + REAL JDK codecs (`javax.imageio`).
  *
  * Fixture spec — every quantity a pure function of doc_id, all pixel
  * channel values < 256 by construction so no modular wrap:
  *   w = 16 + id%48 (16..63), h = 16 + id%32 (16..47), c = id%97 (0..96)
  *   pixel(x,y) = (r,g,b) = (c+x, c+y, c+x+y)   // max 96+62+46 = 204
  * Closed-form channel sums (what the DuckDB oracle computes):
  *   sum_r = h·(w·c + w(w−1)/2)
  *   sum_g = w·(h·c + h(h−1)/2)
  *   sum_b = w·h·c + h·w(w−1)/2 + w·h(h−1)/2
  * PNG is lossless, so a REAL decode must reproduce these sums exactly;
  * JPEG (lossy) is held to exact geometry + mean-luma drift ≤ 8/255.
  */
object ImageCodec {
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false) // in-memory streams only

  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}
  import javax.imageio.ImageIO

  def specW(id: Long): Int = 16 + (id % 48).toInt
  def specH(id: Long): Int = 16 + (id % 32).toInt
  def specC(id: Long): Int = (id % 97).toInt

  /** Render the deterministic gradient image for a doc_id. Bulk setRGB:
    * one colormodel-conversion call per image, not per pixel. */
  def render(id: Long): BufferedImage = {
    val (w, h, c) = (specW(id), specH(id), specC(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = ((c + x) << 16) | ((c + y) << 8) | (c + x + y)
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  private def write(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  def encodePng(id: Long): Array[Byte] = write(render(id), "png")
  def encodeJpeg(id: Long): Array[Byte] = write(render(id), "jpg")

  private def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Per-channel pixel sums + mean luma of a decoded image. Bulk getRGB
    * (one call per image) — per-pixel getRGB pays a colormodel
    * conversion per call and dominated the kernel's profile. */
  private def channelSums(img: BufferedImage): (Long, Long, Long, Double) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      i += 1
    }
    val n = w.toLong * h
    (sr, sg, sb, (sr + sg + sb) / (3.0 * n))
  }

  /** mm03 kernel: REAL decode of the PNG and JPEG payloads. */
  def decodeFeatures(id: Long, png: Array[Byte], jpeg: Array[Byte]): DecodedImage = {
    val p = decode(png)
    val j = decode(jpeg)
    val (sr, sg, sb, pngLuma) = channelSums(p)
    val (_, _, _, jpegLuma) = channelSums(j)
    DecodedImage(id, p.getWidth, p.getHeight, p.getRaster.getNumBands,
      sr, sg, sb, j.getWidth, j.getHeight,
      math.abs(jpegLuma - pngLuma) <= 8.0)
  }

  /** mm04 kernel: REAL decode → bilinear fit-to-224 → re-encode → decode. */
  def resize224(id: Long, png: Array[Byte]): ResizedImage = {
    val src = decode(png)
    val (iw, ih) = (src.getWidth, src.getHeight)
    val (tw, th) =
      if (iw >= ih) (224, ih * 224 / math.max(iw, 1))
      else (iw * 224 / math.max(ih, 1), 224)
    val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, tw, th, null)
    g.dispose()
    val back = decode(write(dst, "png"))
    val (sr, sg2, sb, _) = channelSums(back)
    ResizedImage(id, iw, ih, back.getWidth, back.getHeight,
      2240000L / math.max(math.max(iw, ih), 1), sr + sg2 + sb > 0)
  }

  /** st25 kernel seam: REAL decode → per-channel sums. The vehicle
    * pipeline's detection stage derives its counts from these, so a
    * stubbed decoder cannot reproduce the oracle's closed-form answer. */
  def decodeChannelSums(png: Array[Byte]): (Long, Long, Long) = {
    val (sr, sg, sb, _) = channelSums(decode(png))
    (sr, sg, sb)
  }

  /** mm10 kernel: REAL decode → fire-mask stats → CONDITIONAL overlay
    * re-encode — the fire_consumer_streaming.py:146-219 struct contract
    * (fire_detected, fire_percentage, confidence, image_data) with the
    * reference's emission policy exact: the image field is non-null only
    * for every `emitEveryNth`-th frame OR when fire is detected
    * (`save_image or fire_detected`, :160,192). "Fire" = red channel
    * > 127; the fixture's pixel r = c+x, so mask size, mean-red
    * confidence, and the OVERLAY's red sum (fire pixels painted pure
    * red, the :198-205 visualization) are all closed-form in doc_id.
    * The overlay is genuinely re-encoded to PNG and re-decoded before
    * summing — lossless, so a broken re-encode cannot match the oracle.
    * Integer e4 scaling on both percentages (Canon float policy).
    * One deliberate deviation, documented: the reference keys "every
    * 5th" off its per-BATCH row index (:157), which changes with
    * batching; the stable frame number (doc_id) is the deterministic
    * equivalent. */
  def fireDetect(id: Long, png: Array[Byte], emitEveryNth: Int = 5): FireDetection = {
    val img = decode(png)
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var firePx = 0L
    var sumR = 0L
    var i = 0
    while (i < px.length) {
      val r = (px(i) >> 16) & 0xff
      sumR += r
      if (r > 127) firePx += 1
      i += 1
    }
    val n = w.toLong * h
    val firePctE4 = firePx * 10000L / n
    val confE4 = sumR * 10000L / (255L * n)
    val fireDetected = firePctE4 > 100L
    val emit = (id % emitEveryNth == 0) || fireDetected
    val overlaySumR =
      if (!emit) None
      else {
        val opx = new Array[Int](px.length)
        var j = 0
        while (j < px.length) {
          opx(j) = if (((px(j) >> 16) & 0xff) > 127) 0xff0000 else px(j)
          j += 1
        }
        val overlay = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        overlay.setRGB(0, 0, w, h, opx, 0, w)
        val back = decode(write(overlay, "png"))
        val (sr, _, _, _) = channelSums(back)
        Some(sr)
      }
    FireDetection(id, fireDetected, firePctE4, confE4, emit, overlaySumR)
  }

  /** mm05 kernel: REAL decode of a PNG file's bytes. */
  def decodePng(id: Long, bytes: Array[Byte]): FileImage = {
    val img = decode(bytes)
    val (sr, _, _, _) = channelSums(img)
    FileImage(id, img.getWidth, img.getHeight, sr)
  }

  /** mm07 container: length-prefixed REAL PNG frames (MJPEG-style
    * stand-in for an mp4 — the JDK ships no video codec). Frame k of
    * doc id renders the deterministic image of fixture id·8+k, so
    * every frame's channel sums stay closed-form. */
  def encodeVideo(id: Long): Array[Byte] = {
    val nFrames = 4 + (id % 4).toInt
    val bos = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    (0 until nFrames).foreach { k =>
      val png = encodePng(id * 8 + k)
      dos.writeInt(png.length)
      dos.write(png)
    }
    dos.flush()
    bos.toByteArray
  }

  /** mm07 kernel: parse the container frame by frame, keep every
    * `every`-th frame (the reference's frame-skip,
    * video_producer.py:83-90), REAL-decode kept frames, reduce to
    * features. Skipped frames are never decoded — only sliced past. */
  def sampleFrames(id: Long, container: Array[Byte], every: Int): VideoSample = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(container))
    var k = 0
    var sampled = 0
    var sumR = 0L
    while (in.available() > 0) {
      val len = in.readInt()
      val frame = new Array[Byte](len)
      in.readFully(frame)
      if (k % every == 0) {
        val (sr, _, _, _) = channelSums(decode(frame))
        sumR += sr
        sampled += 1
      }
      k += 1
    }
    VideoSample(id, k, sampled, sumR)
  }

  /** mm11 kernel: scene-change keyframe selection. Every frame is
    * REAL-decoded (unlike mm07's skip — scene detection needs each
    * frame's features) and reduced to its red-channel sum; frame k is
    * a keyframe iff it is the first frame or its sum moved >10 %
    * relative to the previous frame (integer-form comparison
    * `|r_k − r_{k−1}|·10 > r_{k−1}` — no FP ratio, the t09 threshold
    * discipline). At scale the per-frame feature would be a thumbnail
    * decode; the selection logic — a lag comparison down the frame
    * axis — is the same. */
  def keyframes(id: Long, container: Array[Byte]): VideoKeyframes = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(container))
    var k = 0
    var prev = 0L
    var nKey = 0
    var sumKey = 0L
    while (in.available() > 0) {
      val len = in.readInt()
      val frame = new Array[Byte](len)
      in.readFully(frame)
      val (sr, _, _, _) = channelSums(decode(frame))
      if (k == 0 || math.abs(sr - prev) * 10 > prev) {
        nKey += 1; sumKey += sr
      }
      prev = sr
      k += 1
    }
    VideoKeyframes(id, k, nKey, sumKey)
  }

  /** mm08 fixture: closed-form block gray value (MUST stay in lockstep
    * with `MultimodalQueries.blockGraySql`). Quadratic mix keeps distinct
    * ebase values uncorrelated; all intermediates fit a Long. */
  def blockGray(ebase: Long, bx: Int, by: Int): Int = {
    val h = ((ebase + 1) * 2654435761L + (by * 9 + bx + 1) * 40503L) % 100003L
    ((h * h) % 200 + 20).toInt
  }

  /** mm08 fixture image: 9×8 grid of 4×4-px constant-gray blocks
    * (36×32 px). ids sharing a base (id/4) differ only in planted
    * perturbed blocks: variant 1 flips block (2,1), variant 2 flips
    * (2,1) and (5,4), variant 3 is a different image entirely
    * (ebase = base + 41 — an offset that collides with no base, see
    * blockGraySql's scaladoc). */
  def renderBlockImage(id: Long): BufferedImage = {
    val base = id / 4
    val variant = (id % 4).toInt
    val ebase = if (variant == 3) base + 41 else base
    val img = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](36 * 32)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 9) {
        val g0 = blockGray(ebase, bx, by)
        val perturbed = (variant >= 1 && bx == 2 && by == 1) ||
          (variant == 2 && bx == 5 && by == 4)
        val g = if (perturbed) 255 - g0 else g0
        val rgb = (g << 16) | (g << 8) | g
        var dy = 0
        while (dy < 4) {
          var dx = 0
          while (dx < 4) {
            px((by * 4 + dy) * 36 + bx * 4 + dx) = rgb
            dx += 1
          }
          dy += 1
        }
        bx += 1
      }
      by += 1
    }
    img.setRGB(0, 0, 36, 32, px, 0, 36)
    img
  }

  def encodeBlockPng(id: Long): Array[Byte] = write(renderBlockImage(id), "png")

  /** mm08 kernel: REAL decode, 9×8 block means (exact — PNG is lossless
    * and blocks are constant), dHash = adjacent-mean comparisons row by
    * row, emitted as a 64-char bit string (bit b = y·8+x set iff
    * mean(x+1,y) > mean(x,y)). */
  def dhashFromPng(bytes: Array[Byte]): String = {
    val img = decode(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val bw = w / 9
    val bh = h / 8
    val mean = Array.ofDim[Long](8, 9)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 9) {
        var s = 0L
        var dy = 0
        while (dy < bh) {
          var dx = 0
          while (dx < bw) {
            s += (px((by * bh + dy) * w + bx * bw + dx) >> 16) & 0xff
            dx += 1
          }
          dy += 1
        }
        mean(by)(bx) = s / (bw.toLong * bh)
        bx += 1
      }
      by += 1
    }
    val sb = new StringBuilder(64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        sb.append(if (mean(y)(x + 1) > mean(y)(x)) '1' else '0')
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  /** Idempotently materialize PNG fixture FILES img_0.png..img_63.png in a
    * deterministic temp dir (the mm05 `binaryFile` ingest root). Content
    * depends only on doc_id, so the dir is shared across scale factors;
    * a marker file makes regeneration a no-op. */
  def ensureFixtureDir(): String = synchronized {
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_imgfix_v1")
    val marker = new File(dir, "_DONE")
    if (!marker.exists()) {
      dir.mkdirs()
      (0L until 64L).foreach { id =>
        ImageIO.write(render(id), "png", new File(dir, s"img_$id.png"))
      }
      marker.createNewFile()
    }
    dir.getAbsolutePath
  }
}
