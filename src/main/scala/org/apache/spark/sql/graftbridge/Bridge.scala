package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so
  * custom Catalyst expressions expose themselves as Columns through this
  * in-namespace shim — the standard pattern for third-party Spark
  * extensions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** LogicalPlan → DataFrame (`Dataset.ofRows` went `private[sql]` in
    * Spark 4's classic module) — needed to hand a LogicalRelation over
    * a custom [[org.apache.spark.sql.execution.datasources.FileIndex]]
    * back to the public API, the same seam Delta's TahoeFileIndex
    * relation uses. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A V1 `StreamingRelation` for `format` with `options` — the seam
    * that lets an analysis rule rewrite `spark.readStream.table(...)`
    * over a catalog table into the V1 streaming source
    * (`DataSource` and `StreamingRelation` are `private[sql]`). */
  def streamingRelation(spark: org.apache.spark.sql.SparkSession,
                        format: String,
                        options: Map[String, String])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
      org.apache.spark.sql.execution.datasources.DataSource(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        className = format, options = options))

  /** Re-incarnate a micro-batch DataFrame handed to a V1 `Sink` as a
    * plain BATCH frame over the already-planned rows (the DeltaSink
    * pattern): the sink can then drive ordinary batch writes without
    * tripping streaming-plan checks. */
  def asBatch(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** An empty STREAMING DataFrame of `schema` — a V1 streaming Source
    * must return `isStreaming = true` frames from `getBatch`, and the
    * only constructor (`internalCreateDataFrame`) went `private[sql]`
    * in Spark 4's classic module. */
  def emptyStreamingDF(spark: org.apache.spark.sql.SparkSession,
                       schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
