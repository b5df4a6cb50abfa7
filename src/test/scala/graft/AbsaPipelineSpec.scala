package graft

import graft.ml.AbsaPipeline
import org.apache.spark.sql.functions._

/** Unit + pipeline tests for the ABSA scoring path (U1/U2/U7 patterns):
  * deterministic stub scorer, argmax decode, regexp label extraction,
  * null/empty guards (mirroring consumer_postgres_streaming.py:300-305). */
class AbsaPipelineSpec extends SparkTestBase {

  private val scorer = new AbsaPipeline.KeywordScorer

  test("scorer: positive keywords dominate") {
    val p = scorer.score("the fast big table")
    // sentiment triplet for every aspect = POS-heavy
    assert(p(AbsaPipeline.aspects.length) == 0.8)
  }

  test("scorer: negative keywords dominate") {
    val p = scorer.score("slow small stream")
    assert(p(AbsaPipeline.aspects.length + 2) == 0.8)
  }

  test("scorer: balanced → neutral") {
    val p = scorer.score("fast slow data")
    assert(p(AbsaPipeline.aspects.length + 1) == 0.8)
  }

  test("scorer: aspect presence flags") {
    val p = scorer.score("the value of the table")
    assert(p(0) == 0.9) // value present
    assert(p(1) == 0.9) // table present
    assert(p(2) == 0.1) // stream absent
  }

  test("scorer: null and empty text are safe") {
    assert(scorer.score(null).length == 12)
    assert(scorer.score("").length == 12)
  }

  test("pipeline: decode round-trips labels through summary + regexp") {
    import spark.implicits._
    val docs = Seq(
      (1L, "fast value stuff"),
      (2L, "slow table grind"),
      (3L, "plain data row")
    ).toDF("doc_id", "text")
    val out = AbsaPipeline.decoded(AbsaPipeline.withProbs(docs))
      .select("doc_id", "value_label", "table_label", "stream_label")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out(1L) == (("POS", "ABSENT", "ABSENT")))
    assert(out(2L) == (("ABSENT", "NEG", "ABSENT")))
    assert(out(3L) == (("ABSENT", "ABSENT", "ABSENT")))
  }

  test("pipeline: probs layout matches the declared 3+9 contract") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val probs = AbsaPipeline.withProbs(docs).select("probs").head().getSeq[Double](0)
    assert(probs.length == AbsaPipeline.aspects.length * 4)
  }

  test("model seam: scorer implementation is pluggable by class name") {
    val key = "graft.absa.scorer.class"
    assert(AbsaPipeline.resolveScorer().isInstanceOf[AbsaPipeline.KeywordScorer])
    sys.props(key) = classOf[ConstantScorer].getName
    try assert(AbsaPipeline.resolveScorer().isInstanceOf[ConstantScorer])
    finally sys.props -= key
  }
}

/** Stand-in for a real-runtime Scorer (e.g. an ONNX session loaded in
  * the constructor) — proves the U1 seam binds by class name. */
class ConstantScorer extends AbsaPipeline.Scorer {
  def score(text: String): Array[Double] = Array.fill(12)(0.5)
}

/** The real in-JVM inference path behind the U1 seam: an actual
  * feed-forward network (hashed BoW → relu dense → sigmoid/softmax
  * heads) with a binary weight artifact — what a production deployment
  * swaps in for the keyword stub. */
class MlpScorerSpec extends SparkTestBase {
  import graft.ml.MlpScorer

  test("MLP inference: output obeys the 3+9 probability contract") {
    val p = new MlpScorer().score("the quick brown fox jumps over the lazy dog")
    assert(p.length == 12)
    assert(p.forall(v => v >= 0.0 && v <= 1.0))
    // each sentiment triplet is a softmax → sums to 1
    (0 until 3).foreach { a =>
      val s = p(3 + a * 3) + p(3 + a * 3 + 1) + p(3 + a * 3 + 2)
      assert(math.abs(s - 1.0) < 1e-9, s"aspect $a triplet sums to $s")
    }
  }

  test("MLP inference: deterministic across instances; null-safe; text-sensitive") {
    val m1 = new MlpScorer(); val m2 = new MlpScorer()
    val t = "streaming joins are fast"
    assert(m1.score(t).toSeq == m2.score(t).toSeq)
    assert(m1.score(null).length == 12) // null guard like the reference UDF
    assert(m1.score(t).toSeq != m1.score("tables are slow today").toSeq)
  }

  test("MLP artifact: weight file round-trips to the identical network") {
    val path = java.nio.file.Files.createTempFile("graft_mlp_", ".bin").toString
    MlpScorer.writeWeights(path)
    val fromInit = new MlpScorer().score("artifact parity check")
    sys.props(MlpScorer.WeightsProp) = path
    try {
      val fromArtifact = new MlpScorer().score("artifact parity check")
      assert(fromArtifact.toSeq == fromInit.toSeq)
    } finally sys.props -= MlpScorer.WeightsProp
  }

  test("MLP binds through the scorer seam by class name") {
    val key = "graft.absa.scorer.class"
    sys.props(key) = classOf[MlpScorer].getName
    try {
      val s = AbsaPipeline.resolveScorer()
      assert(s.isInstanceOf[MlpScorer])
      assert(s.score("seam check").length == 12)
    } finally sys.props -= key
  }
}
