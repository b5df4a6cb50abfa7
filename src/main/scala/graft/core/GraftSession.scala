package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Defaults chosen for 100 TB-scale design, validated on local[32]:
  *   - AQE on (runtime coalescing, skew-join splitting, broadcast demotion)
  *   - shuffle partitions sized to local cores (overridden by AQE at scale)
  *   - UTC session timezone (oracle parity with DuckDB)
  *   - Arrow/vectorized readers left at Spark defaults (on) — the reference
  *     disabled Arrow (consumer_postgres_streaming.py:211) only because of
  *     pandas_udf memory limits in its Docker setup; our engine is JVM-native.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Spark's INT96 default writes timestamp columns with NO parquet
      // min/max statistics — every timestamp-sorted layout then scans
      // the whole table because nothing can row-group-prune (measured
      // in ScaleToolsSpec: 6000/6000 rows vs 838/6000 with INT64).
      // INT64 micros is the modern type and what every other engine
      // (and the parquet spec) expects.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir", // bucketed saveAsTable scratch
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.shuffle.spill.compress", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run `body` with the given runtime SQL confs set, restoring each
    * key's prior value (or unsetting a previously-unset key) on the way
    * out. Query bodies share one engine session, so a conf they flip
    * must not leak into the next query — every query-scoped
    * `spark.conf.set` goes through here. Restoration happens as soon as
    * `body` returns: confs that gate PARSING/ANALYSIS (e.g.
    * spark.sql.scripting.enabled) are safe because `spark.sql` resolves
    * the plan eagerly; a conf that must stay set through a later
    * ACTION on the returned frame doesn't fit this helper. */
  def withConf[A](spark: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val prior = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
