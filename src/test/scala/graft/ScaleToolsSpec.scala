package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Skew + co-location toolkit tests: salted aggregation/join equal their
  * unsalted counterparts; bucketed joins eliminate the shuffle. */
class ScaleToolsSpec extends SparkTestBase {

  test("salted sum equals plain groupBy sum") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val salted = Salting.saltedSum(li, Seq("l_returnflag"), "l_quantity",
      nSalts = 8, saltFrom = Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = li.groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }

  test("salted join equals plain join (row multiset)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val dim = orders.select("o_orderkey", "o_orderstatus")
    val saltedRows = Salting.saltedJoin(li, dim, "o_orderkey",
      nSalts = 4, saltFrom = Seq("o_orderkey", "l_quantity"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plainRows = li.join(dim, "o_orderkey")
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedRows == plainRows)
  }

  test("partitioned layout prunes untouched partitions at the scan") {
    val out = Files.createTempDirectory("graft_part").toString
    graft.core.Tables(spark, sfDir).events
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val one = spark.read.parquet(out).filter(col("event_type") === "purchase")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
           plan.contains("event_type"),
      s"partition filter did not reach the scan:\n$plan")
    // pruned scan must read strictly fewer files than the full table
    // (inputFiles ignores filters — read the scan node's runtime metric)
    val scanned = one.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    val allFiles = spark.read.parquet(out).inputFiles.length
    assert(scanned > 0 && scanned < allFiles,
      s"pruning scanned $scanned of $allFiles files")
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — SparkTestBase points it at a temp
    // dir when the shared session is built
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    // disable broadcast so the join itself must pick sort-merge, then
    // prove bucketing removed the pre-join exchanges
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
      // the only exchange allowed is the post-join aggregation shuffle on
      // o_orderstatus — neither join key may be re-shuffled
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles the lineitem side:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles the orders side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
