package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen cosine similarity over array<double> (SURVEY §4.2's
  * "custom codegen Expression for cosine iff the higher-order-function
  * formulation is too slow").
  *
  * The HOF form (`aggregate(zip_with(a, b, *), 0d, +)`) materializes an
  * intermediate array and walks interpreted lambdas per element; this
  * expression is one fused primitive loop, called from generated code as
  * a static method — whole-stage codegen stays intact. Accumulation is
  * sequential left-to-right, bitwise-matching the HOF form and other
  * engines' list_sum for equal-length inputs, so oracle results are
  * unchanged. Length mismatch: computes over the common prefix (the HOF
  * zip_with form would return NULL instead) — all engine vectors are
  * fixed-dim by the embeddings contract.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  /** Fused dot/norm pass; NaN when either vector is all-zero. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getDouble(i); val b = y.getDouble(i)
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    dot / math.sqrt(nx * ny)
  }

  /** Column-API entry point. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    // inputs normalized here (no ImplicitCastInputTypes: AbstractDataType
    // is private[sql]); callers may pass array<float> or array<double>
    val ad = a.cast("array<double>"); val bd = b.cast("array<double>")
    Bridge.column(CosineSim(Bridge.expression(ad), Bridge.expression(bd)))
  }
}
