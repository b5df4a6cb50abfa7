package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Catalog schema-adaptivity — the round-7 regression class.
  *
  * The testdata generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) and later as timestamp[us]; a single-spelling
  * workaround in the catalog broke 46 queries when the spelling flipped.
  * These tests pin every spelling the catalog claims to handle, so the
  * next regeneration surfaces as ONE failing test naming the drift
  * instead of dozens of cryptic analysis errors.
  */
class CatalogSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("normalizeTs: epoch-nanos LongType rebuilds micro-precision TIMESTAMP") {
    import spark.implicits._
    // 2026-01-02 03:04:05.123456789 UTC as epoch nanos; the 789 sub-micro
    // tail must truncate, not round, and must not lose precision to a
    // double intermediate (1.7e18 > 2^53)
    val nanos = 1767323045123456789L
    val df = Seq((1L, nanos)).toDF("event_id", "ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0)
    assert(got === "2026-01-02 03:04:05.123456")
  }

  test("normalizeTs: TIMESTAMP_NTZ relabels to session-tz TIMESTAMP, same instant") {
    import spark.implicits._
    val df = Seq((1L, "2026-01-02 03:04:05.123456"))
      .toDF("event_id", "s")
      .withColumn("ts", to_timestamp_ntz(col("s")))
      .drop("s")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    // UTC session → the wall-clock reading is unchanged
    val got = out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0)
    assert(got === "2026-01-02 03:04:05.123456")
  }

  test("normalizeTs: TimestampType passes through untouched") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05")))
      .toDF("event_id", "ts")
    assert(Tables.normalizeTs(df) eq df)
  }

  test("normalizeTs: any other dtype fails fast with a NAMED diff") {
    import spark.implicits._
    val df = Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("STRING"))
  }

  test("events accessor: timestamp[us] NTZ parquet spelling (current generator) reads clean") {
    import spark.implicits._
    val dir = tmp("graft_cat_ntz_")
    Seq((1L, "2026-01-02 03:04:05", 7L, "click", 1.5, "{}"),
        (2L, "2026-01-02 04:00:00", 8L, "view", 2.5, "{}"))
      .toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("s"))).drop("s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() === 2)
    // legacy nanos conf must NOT have been touched on this path
    assert(!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
  }

  test("events accessor: UTC-adjusted timestamp[us] parquet spelling reads clean") {
    import spark.implicits._
    val dir = tmp("graft_cat_utc_")
    // TimestampType + outputTimestampType=TIMESTAMP_MICROS writes
    // isAdjustedToUTC=true → reads straight back as TIMESTAMP
    Seq((1L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05"), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() === 1)
  }

  test("registerAll is per-table fault-isolated (one bad table ≠ ten dead views)") {
    import spark.implicits._
    val dir = tmp("graft_cat_iso_")
    // only two of the ten tables exist; registerAll must still register
    // them and skip the missing eight without throwing
    Seq((0, "AFRICA")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$dir/region.parquet")
    Seq((0, "ALGERIA", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    val skipped = Tables(spark, dir).registerAll()
    // the skip list names the unreadable eight so callers can surface
    // the root read error next to a later TABLE_OR_VIEW_NOT_FOUND
    assert(skipped.map(_._1).toSet ===
      Tables.names.toSet -- Set("region", "nation"))
    assert(skipped.forall(_._2 != null))
    assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) === 1)
    assert(spark.sql(
      """SELECT r_name FROM nation JOIN region ON n_regionkey = r_regionkey"""
    ).head().getString(0) === "AFRICA")
  }

  test("events accessor: legacy TIMESTAMP(NANOS) parquet spelling falls back and reads clean") {
    // Spark cannot WRITE a NANOS-annotated parquet file, so this fixture
    // was generated with pyarrow (timestamp[ns], format version 2.6) and
    // committed — the only way to pin the eventsRaw catch-retry path
    // against the real [ILLEGAL_PARQUET_TYPE] error, which is how the
    // pre-round-8 testdata actually spelled events.ts.
    // NOTE: registered LAST-ish in this suite on purpose — the fallback
    // legitimately sets the legacy nanosAsLong conf, and the NTZ test
    // above asserts the conf is NOT set on the modern path.
    val url = getClass.getResource("/nanos_events/events.parquet")
    assert(url != null, "nanos fixture missing from test resources")
    val dir = new java.io.File(url.toURI).getParent
    try {
      val ev = Tables(spark, dir).events
      assert(ev.schema("ts").dataType === TimestampType)
      assert(ev.count() === 5)
      // 2026-01-02 03:04:05.123456789 → sub-micro tail truncates exactly
      val first = ev.filter(col("event_id") === 1)
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .head().getString(0)
      assert(first === "2026-01-02 03:04:05.123456")
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("schema audit: testdata sf0.001 is clean") {
    val diffs = Tables(spark, sfDir).audit()
    assert(diffs.isEmpty, s"schema drift:\n${diffs.mkString("\n")}")
  }

  test("schema audit: names the drift when a column's dtype changes") {
    import spark.implicits._
    val dir = tmp("graft_cat_drift_")
    // region with r_regionkey as STRING instead of INT
    Seq(("0", "AFRICA")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$dir/region.parquet")
    val diffs = Tables(spark, dir).audit()
    assert(diffs.exists(d => d.contains("region.r_regionkey") &&
      d.contains("expected INT") && d.contains("got STRING")))
    // the other nine tables are unreadable in this fixture dir — each
    // must be reported, not thrown
    assert(diffs.exists(_.startsWith("events: unreadable")))
  }
}
