package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Spark 4 State Data Source (st32's observability surface): beyond the
  * oracle-checked final read-back, pin the parts a DuckDB oracle can't
  * see — the operator METADATA table and per-batch TIME TRAVEL. A
  * 3-batch MemoryStream drives a grouped agg so every intermediate
  * state version is known exactly:
  *
  *   batch 0: (a,1) (b,2)      → state {a:1, b:2}
  *   batch 1: (a,10)           → state {a:11, b:2}
  *   batch 2: (c,5) (b,1)      → state {a:11, b:3, c:5}
  *
  * The statestore source must reproduce each version from the
  * checkpoint alone — no replay of the input — which is what makes it
  * an O(state) debugging tool on a 100 TB cluster: reading a wedged
  * query's store costs the store's size, never the stream's history. */
class StateReaderSpec extends SparkTestBase {

  test("statestore source: metadata + batchId time travel reproduce every state version") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val src = MemoryStream[(String, Long)]
    val agg = src.toDF().toDF("k", "v").groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))

    val cp = Streams.scratchDir("graft_cp_streader_")
    Streams.withStreamShufflePartitions(spark) {
      val q = agg.writeStream
        .outputMode("complete").format("noop")
        .option("checkpointLocation", cp)
        .start()
      try {
        src.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
        src.addData(("a", 10L)); q.processAllAvailable()
        src.addData(("c", 5L), ("b", 1L)); q.processAllAvailable()
      } finally q.stop()
    }

    def stateAt(batchId: Option[Long]): Map[String, (Long, Long)] = {
      val r = batchId.foldLeft(spark.read.format("statestore")) {
        (b, id) => b.option("batchId", id)
      }
      r.load(cp)
        .select(col("key.k"), col("value.sum"), col("value.count"))
        .as[(String, Long, Long)].collect()
        .map { case (k, s, n) => k -> (s, n) }.toMap
    }

    // time travel: every version exactly as constructed
    assert(stateAt(Some(0L)) === Map("a" -> (1L, 1L), "b" -> (2L, 1L)))
    assert(stateAt(Some(1L)) === Map("a" -> (11L, 2L), "b" -> (2L, 1L)))
    assert(stateAt(Some(2L)) === Map("a" -> (11L, 2L), "b" -> (3L, 2L), "c" -> (5L, 1L)))
    // default read = latest committed version
    assert(stateAt(None) === stateAt(Some(2L)))

    // metadata table: one agg operator, all three batches committed
    val md = spark.read.format("state-metadata").load(cp)
      .select("operatorName", "minBatchId", "maxBatchId")
      .as[(String, Long, Long)].collect()
    assert(md.toSeq === Seq(("stateStoreSave", 0L, 2L)))
  }

  test("statestore source reads a transformWithState ValueState by name") {
    // st11's API tier: user-defined state variables read back via
    // option("stateVarName", ...) — the engine's own RunningTotalsProcessor
    // keeps (n, cents) per user; the offline read must surface exactly
    // the totals the drain computed, and state-metadata must list the
    // named variable in the processor's registry.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val src = MemoryStream[(Long, Long)]
    val cp = Streams.scratchDir("graft_cp_stws_")
    Streams.withStreamShufflePartitions(spark) {
      val updated = src.toDS().groupByKey(_._1)
        .transformWithState(new graft.streaming.RunningTotalsProcessor(),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[(Long, Long, Long)])
        .toDF("user_id", "n", "cents")
      val q = updated.writeStream
        .outputMode("update").format("noop")
        .option("checkpointLocation", cp)
        .start()
      try {
        src.addData((7L, 100L), (8L, 50L)); q.processAllAvailable()
        src.addData((7L, 25L)); q.processAllAvailable()
      } finally q.stop()
    }

    val st = spark.read.format("statestore")
      .option("stateVarName", "totals").load(cp)
      .select(col("key.value").as("user_id"),
              col("value._1").as("n"),
              col("value._2").as("cents"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(st === Map(7L -> (2L, 125L), 8L -> (1L, 50L)),
      s"transformWithState read-back diverges: $st")

    val props = spark.read.format("state-metadata").load(cp)
      .select("operatorName", "operatorProperties")
      .as[(String, String)].collect()
    assert(props.length == 1 && props(0)._1 == "transformWithStateExec")
    assert(props(0)._2.contains("\"stateName\":\"totals\"") &&
           props(0)._2.contains("ValueState"),
      s"metadata must list the named state variable: ${props(0)._2}")
  }
}
