package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: minimum Karp–Rabin rolling hash
  * over all byte windows of length `window` (north star "document
  * fingerprinting (rolling hash)").
  *
  * One pass over the UTF-8 bytes, O(1) per step — at 100 TB this runs
  * inside whole-stage codegen as a static call, no UDF serialization.
  * Complements the md5 content fingerprint (t04): equal fingerprints
  * survive small edits *outside* the minimizing window, so it's the
  * cheap prefilter for near-dup mining.
  */
case class RollingHashMin(child: Expression, window: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = window
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  override def nullSafeEval(s: Any, w: Any): Any =
    RollingHashMin.compute(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w) =>
      s"${ev.value} = graft.functions.RollingHashMin.compute($s, $w);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RollingHashMin =
    copy(child = l, window = r)
}

object RollingHashMin {
  private val Base = 257L
  private val Mod = 1000000007L

  /** Min rolling hash over byte windows; hash of the whole (short) string
    * when it is shorter than the window; 0 for the empty string. */
  def compute(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0 || window <= 0) return 0L
    val w = math.min(window, n)
    // precompute Base^(w-1) mod Mod
    var pow = 1L
    var k = 1
    while (k < w) { pow = pow * Base % Mod; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    var minH = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * pow % Mod + Mod * 256) % Mod
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  def rollingHashMin(c: Column, window: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RollingHashMin(Bridge.expression(c.cast("string")),
      org.apache.spark.sql.catalyst.expressions.Literal(window)))
  }
}
