package graft

import graft.dedup.DedupQueries
import org.apache.spark.sql.functions._

/** The MinHash hash-family swap seam (SURVEY A12 scale path): the
  * pipeline's math is family-agnostic, so the codegen'd xxhash64 family
  * must be a drop-in for the oracle-checkable md5 family — same schema
  * shape, same dedup-relevant invariants, only the signature values
  * differ. */
class DedupSeamSpec extends SparkTestBase {

  private def docs = graft.core.Tables(spark, sfDir).documents

  test("fast family: signature schema matches the md5 family") {
    val slow = DedupQueries.signatures(docs)
    val fast = DedupQueries.signatures(docs, DedupQueries.fastHashFn)
    assert(fast.columns.toSeq == slow.columns.toSeq)
    assert(fast.count() == slow.count())
  }

  test("fast family: identical texts get identical signatures") {
    // dedup's core invariant under ANY family: signatures are a pure
    // function of text, so exact duplicates always collide in every band
    val sig = DedupQueries.signatures(docs, DedupQueries.fastHashFn)
    val byText = docs.select(col("doc_id"), md5(col("text")).as("content"))
      .join(sig, "doc_id")
    val nGroups = byText.select("content").distinct().count()
    val nSigGroups = byText
      .select((Seq(col("content")) ++
        (0 until DedupQueries.numHashes).map(j => col(s"sig$j"))): _*)
      .distinct().count()
    assert(nSigGroups == nGroups,
      "same text must map to one signature tuple per content group")
  }

  test("fast family: the hash path stays inside whole-stage codegen") {
    val fast = DedupQueries.signatures(docs, DedupQueries.fastHashFn)
    fast.collect()
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"xxhash64 family fell out of codegen:\n$plan")
  }
}
