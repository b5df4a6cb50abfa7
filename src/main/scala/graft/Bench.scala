package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` write — full materialization of
  * every row (a bare `.count()` on a scan would be answered from parquet
  * footers and benchmark nothing). One warm-up query runs first so JVM/
  * codegen startup isn't billed to the first benchmark entry.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally spark.catalog.clearCache() // release per-query persists (d03/d05 sig tables)
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up pass over every query: JIT, codegen compilation, and class
    // loading otherwise bill tens of seconds to whichever query touches a
    // codepath first (observed: 13.7 s cold vs 0.55 s warm for a string
    // pack over 20k rows). The timed pass then measures steady state.
    val names = SparkEntry.all.map(_.name)
    names.foreach(once)

    // Quiesce the heap before each timed query: without it, collection
    // debt from the previous query's shuffle buffers lands inside the
    // next query's wall time (the mechanism behind the observed 10×
    // same-code swings on the suite's heaviest entries).
    val results = names.map { n => System.gc(); n -> once(n) }
    // Locale.ROOT formatting: f"%.3f" under a comma-decimal default
    // locale would emit invalid JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Persist a copy the driver/judge can read without stdout scraping.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Stop Spark BEFORE printing so the JSON is the final stdout line
    // (shutdown logging goes to stderr, but don't race it).
    spark.stop()
    println(line)
  }
}
