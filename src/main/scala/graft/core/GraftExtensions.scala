package graft.core

import graft.functions.{CosineSim, HammingDistance, RollingHashMin}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so the spark.sql text tier (the
  * dashboards' surface, SURVEY §3.3) can call them:
  *
  *   SELECT cosine_sim(embedding, embedding) FROM embeddings
  *   SELECT rolling_hash_min(text, 32) FROM documents
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or config `spark.sql.extensions=graft.core.GraftExtensions`, or call
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
    ext.injectFunction(GraftExtensions.hammingDescriptor)
    ext.injectFunction(GraftExtensions.ngramsDescriptor)
    ext.injectFunction(GraftExtensions.zorderDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.SelfCosineFold)
    // named-table SQL over the snapshot catalog: rewrite GraftTable
    // reads into the SnapshotFileIndex relation during analysis (the
    // DeltaAnalysis pattern) so `SELECT ... FROM graft.db.t` plans the
    // same pruned scan as the programmatic API
    ext.injectResolutionRule(s => graft.sources.GraftCatalogResolution(s))
    // maintenance verbs (OPTIMIZE / VACUUM / DESCRIBE HISTORY) — no
    // Spark grammar exists for them; everything else delegates
    ext.injectParser((_, delegate) => new graft.sources.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Arity guard for the SQL-tier builders: a miscalled function must
    * fail as a proper ANALYSIS error (the same WRONG_NUM_ARGS condition
    * Spark's built-ins raise), not an IndexOutOfBoundsException from
    * `children(1)` deep in the builder. */
  private def requireArity(name: String, children: Seq[Expression],
                           min: Int, max: Int): Unit =
    if (children.length < min || children.length > max)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> (if (min == max) min.toString else s"[$min, $max]"),
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        requireArity("cosine_sim", children, 2, 2)
        CosineSim(toDoubleArray(children(0)), toDoubleArray(children(1)))
      })

  val rollingHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("rolling_hash_min"),
      new ExpressionInfo(classOf[RollingHashMin].getName, "rolling_hash_min"),
      (children: Seq[Expression]) => {
        requireArity("rolling_hash_min", children, 1, 2)
        RollingHashMin(Cast(children(0), StringType),
          if (children.length > 1) Cast(children(1), IntegerType) else Literal(32))
      })

  val hammingDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_dist"),
      (children: Seq[Expression]) => {
        requireArity("hamming_dist", children, 2, 2)
        HammingDistance(Cast(children(0), StringType), Cast(children(1), StringType))
      })

  val ngramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[graft.functions.NGrams].getName, "ngrams"),
      (children: Seq[Expression]) => {
        requireArity("ngrams", children, 2, 2)
        graft.functions.NGrams(Cast(children(0), StringType), children(1))
      })

  val zorderDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("zorder"),
      new ExpressionInfo(classOf[graft.functions.ZOrder].getName, "zorder"),
      (children: Seq[Expression]) => {
        requireArity("zorder", children, 2, 2)
        graft.functions.ZOrder(Cast(children(0), org.apache.spark.sql.types.LongType),
          Cast(children(1), org.apache.spark.sql.types.LongType))
      })

  /** Register on an already-built session (temp functions), including the
    * typed vector_avg aggregate. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      cosineSimDescriptor._3, "built-in")
    reg.createOrReplaceTempFunction("rolling_hash_min",
      rollingHashDescriptor._3, "built-in")
    reg.createOrReplaceTempFunction("hamming_dist",
      hammingDescriptor._3, "built-in")
    reg.createOrReplaceTempFunction("ngrams",
      ngramsDescriptor._3, "built-in")
    reg.createOrReplaceTempFunction("zorder",
      zorderDescriptor._3, "built-in")
    spark.udf.register("vector_avg",
      org.apache.spark.sql.functions.udaf(graft.functions.VectorAvgAggregator,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()))
    // Misra-Gries frequent-items summary for the SQL tier (k = 64, the
    // q78 default; other widths construct the Aggregator directly)
    spark.udf.register("freq_sketch",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.FreqSketchAggregator(64),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]()))
  }
}
