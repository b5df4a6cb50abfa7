package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (U6): `ngrams(text, n)` emits one row per
  * DISTINCT whitespace n-gram of `text`, in first-occurrence order —
  * the table-function form of `DedupQueries.shingles` (split →
  * sliding(n) → distinct composed as column expressions). As a native
  * Generator it plugs into `GenerateExec` exactly like the built-in
  * `explode`, usable from SQL text (`LATERAL VIEW ngrams(text, 3)`),
  * which the composed-expression form is not.
  *
  * Semantics match `shingles(text, n)`: fewer than n words ⇒ no rows;
  * single-space splitting (the corpus contract, TESTDATA.md); distinct.
  * `n` must be a foldable integer — enforced at construction like the
  * built-in generators do (a non-literal width would make the output
  * schema row-dependent).
  */
case class NGrams(child: Expression, width: Expression)
    extends Generator with CodegenFallback {

  require(width.foldable, "ngrams(text, n): n must be a literal")
  private lazy val n: Int = width.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, width)
  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null || n <= 0) Iterator.empty
    else {
      // limit -1: keep trailing empty tokens, exactly like Spark's
      // split(text, " ") expression — the composed shingles() form this
      // generator must stay row-for-row identical with (Java's default
      // split drops trailing empties; a trailing-space text would
      // otherwise shingle differently between the two forms)
      val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < n) Iterator.empty
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + n <= words.length) {
          seen.add(words.slice(i, i + n).mkString(" "))
          i += 1
        }
        val it = seen.iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow =
            InternalRow(UTF8String.fromString(it.next()))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGrams =
    copy(child = newChildren(0), width = newChildren(1))
}
