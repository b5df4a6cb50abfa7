package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.10 U5): element-wise mean of
  * `array<float>` vectors — the centroid aggregate, as a user-defined
  * typed aggregate instead of the posexplode formulation (q31).
  *
  * Buffer = (element-wise double sums, count): partial buffers merge
  * associatively on the reduce side, so the shuffle carries one
  * 64-double buffer per group per partition instead of 64 exploded rows
  * per input vector — at 100 TB this is the difference between a
  * (label, pos, x) shuffle 64× the input and a compact per-group sketch.
  * Registered for SQL as `vector_avg` by `GraftExtensions.register`.
  */
object VectorAvgAggregator
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  /** Ragged inputs are tolerated by growing the buffer to the longest
    * vector seen (shorter vectors contribute zero to the tail dims). */
  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums =
      if (b._1.length >= v.length) b._1
      else java.util.Arrays.copyOf(b._1, v.length)
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val (long, short) = if (a._1.length >= b._1.length) (a._1, b._1) else (b._1, a._1)
      var i = 0
      while (i < short.length) { long(i) += short(i); i += 1 }
      (long, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.product[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
