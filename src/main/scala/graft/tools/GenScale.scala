package graft.tools

/** Materialize one ScaleStress-scaled corpus into a FIXED directory so
  * a single scale point can be probed repeatedly (graft.tools.Probe)
  * without paying the full harness's generate-run-delete cycle per
  * iteration. The harness proper ([[ScaleStress]]) still generates into
  * a shutdown-hook-registered temp root; this tool is for the
  * explain-and-iterate loop on one (query, scale) outlier. */
object GenScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GenScale <baseDir> <k> <outDir>")
    val (baseDir, k, out) = (args(0), args(1).toInt, args(2))
    val spark = graft.core.GraftSession.getOrCreate()
    val t0 = System.nanoTime()
    ScaleStress.generate(spark, baseDir, k, out)
    println(f"[genscale] x$k from $baseDir -> $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
