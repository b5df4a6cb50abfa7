package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator implementations live in the `QueryPack` objects; this is
  * only the registry the driver harness reads.
  */
object SparkEntry {

  /** All query packs, each covering one region of SURVEY.md §2. */
  def packs: Seq[QueryPack] = Seq(
    graft.operators.AggregateQueries,
    graft.operators.JoinQueries,
    graft.operators.ScalarQueries,
    graft.operators.WindowQueries,
    graft.operators.SetOpQueries,
    graft.operators.AdvancedQueries,
    graft.operators.DepthQueries,
    graft.operators.AsofQueries,
    graft.sources.SourceQueries,
    graft.analysis.TextQueries,
    graft.analysis.QualityQueries,
    graft.analysis.BpeQueries,
    graft.operators.PipelineQueries,
    graft.operators.BreadthQueries,
    graft.operators.ProfilingQueries,
    graft.dedup.DedupQueries,
    graft.graph.GraphQueries,
    graft.similarity.SimilarityQueries,
    graft.multimodal.MultimodalQueries,
    graft.ml.MlQueries,
    graft.streaming.StreamingQueries,
    graft.streaming.VehiclePipeline,
    graft.streaming.FirePipeline,
    graft.streaming.AbsaJdbcPipeline,
  )

  def all: Seq[GraftQuery] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship dashboard query (vehicle counts per camera ×
    * type — vehicle_counting_app.py:38-47) recast over `events`: parse the
    * JSON props envelope, bucket by day, count + sum per type.
    */
  def entry(spark: SparkSession): DataFrame = {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    t.events
      .select(col("event_type"), col("value"),
              get_json_object(col("props"), "$.k").cast("int").as("k"),
              date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n_events"),
           (graft.functions.Canon.sumCents(col("value")) / 100.0).as("sum_value"),
           (floor(avg(col("k")) * 100 + 0.5) / 100.0).as("avg_k"))
      .orderBy(col("day").asc, col("event_type").asc)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
