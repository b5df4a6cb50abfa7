package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen byte-wise Hamming distance over equal-length strings
  * — the verification kernel for SimHash near-dup mining (d09), where
  * signatures are fixed-width ASCII bit-strings.
  *
  * The composed form (16 `substring(a,j,1) <> substring(b,j,1)` terms)
  * allocates a UTF8String slice per position per row; this is one fused
  * byte loop called from generated code as a static method, so
  * whole-stage codegen stays intact. Contract: byte-wise distance;
  * returns NULL when byte lengths differ (for ASCII inputs byte length
  * == char length, so this is exactly the equal-length-string Hamming).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = HammingDistance.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int ${ev.value}_r = graft.functions.HammingDistance.compute($a, $b);
      |if (${ev.value}_r < 0) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

object HammingDistance {
  /** Byte-wise differing-position count; -1 signals length mismatch
    * (mapped to NULL by the expression). */
  def compute(x: UTF8String, y: UTF8String): Int = {
    val n = x.numBytes()
    if (n != y.numBytes()) return -1
    var d = 0
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) d += 1
      i += 1
    }
    d
  }

  /** Column-API entry point. */
  def hammingDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(HammingDistance(
      Bridge.expression(a.cast("string")), Bridge.expression(b.cast("string"))))
  }
}
