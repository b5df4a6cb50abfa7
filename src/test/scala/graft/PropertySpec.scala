package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based checks (seeded ScalaCheck generators, batched into
  * single Spark jobs): the codegen'd expression kernels against naive
  * reference implementations, and the Canon exactness property that
  * motivates integer-cents aggregation. */
class PropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(rng.Seed(seed))(_.next)
      .map(s => g.pureApply(params, s))
      .take(n).toSeq
  }

  test("RollingHashMin.compute matches the brute-force window minimum") {
    val Base = 257L
    val Mod = 1000000007L
    def brute(s: String, window: Int): Long = {
      val bytes = s.getBytes("UTF-8")
      val n = bytes.length
      if (n == 0 || window <= 0) return 0L
      val w = math.min(window, n)
      (0 to n - w).map { i =>
        var h = 0L
        var j = 0
        while (j < w) { h = (h * Base + (bytes(i + j) & 0xff)) % Mod; j += 1 }
        h
      }.min
    }
    val genCase = for {
      s <- Gen.oneOf(
        Gen.alphaNumStr,
        Gen.listOf(Gen.choose(Char.MinValue, '퟿')).map(_.mkString), // incl. multi-byte UTF-8
        Gen.const(""))
      w <- Gen.choose(1, 12)
    } yield (s, w)
    sample(genCase, 300, seed = 7L).foreach { case (s, w) =>
      val got = graft.functions.RollingHashMin.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), w)
      assert(got == brute(s, w), s"string=${s.take(40)} window=$w")
    }
  }

  test("RollingHashMin expression path (eval/codegen) equals the driver kernel") {
    import spark.implicits._
    val strings = sample(Gen.alphaNumStr, 100, seed = 11L).distinct
    val df = strings.toDF("s")
      .select(col("s"), graft.functions.RollingHashMin.rollingHashMin(col("s"), 8).as("h"))
    df.collect().foreach { r =>
      val expect = graft.functions.RollingHashMin.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)), 8)
      assert(r.getLong(1) == expect, s"expression diverged on '${r.getString(0)}'")
    }
  }

  test("CosineSim is bounded, symmetric, and 1.0 on itself") {
    import spark.implicits._
    import graft.functions.CosineSim.cosineFast
    val genVec = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
      .suchThat(_.exists(_ != 0.0)).map(_.toArray)
    val vecs = sample(genVec, 120, seed = 23L)
    val df = vecs.zip(vecs.reverse).toDF("a", "b")
      .select(cosineFast(col("a"), col("b")).as("ab"),
              cosineFast(col("b"), col("a")).as("ba"),
              cosineFast(col("a"), col("a")).as("aa"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9, "out of [-1,1]")
      assert(r.getDouble(0) == r.getDouble(1), "not symmetric") // same fused loop order
      assert(math.abs(r.getDouble(2) - 1.0) <= 1e-12, "cos(v,v) != 1")
    }
  }

  test("gopherKeep column matches a plain-Scala reference model on random text") {
    import spark.implicits._
    // Reference model: literal re-implementation of the t09 gate over a
    // whitespace-split token stream (including the empty tokens that
    // doubled spaces produce — split(' ') semantics, not \s+).
    def refKeep(text: String): Boolean = {
      val toks = text.split(" ", -1).toSeq
      val nWords = toks.length.toLong
      val charsNs = text.count(_ != ' ').toLong
      val nUniq = toks.distinct.length.toLong
      val padded = " " + text + " "
      def occ(w: String): Long = {
        var i = 0; var n = 0L
        while ({ i = padded.indexOf(w, i); i >= 0 }) { n += 1; i += w.length }
        n
      }
      val nStop = occ(" the ") + occ(" a ") + occ(" of ")
      nWords >= 50 && nWords <= 100000 &&
        charsNs >= nWords * 3 && charsNs <= nWords * 10 &&
        nUniq * 5 >= nWords && nStop >= 2
    }
    val words = Gen.oneOf("the", "a", "of", "data", "q", "verylongtoken",
      "spark", "row", "", "x7")
    val textGen = for {
      n <- Gen.choose(1, 120)
      ws <- Gen.listOfN(n, words)
    } yield ws.mkString(" ")
    val texts = sample(textGen, 200, seed = 11L)
    val got = texts.toDF("text")
      .select(graft.analysis.QualityQueries.gopherKeep.as("keep"))
      .collect().map(_.getBoolean(0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == refKeep(t), s"gate mismatch on '${t.take(60)}...'")
    }
  }

  test("d14/d15 shared chunkRelation matches grouped(8) on random word lists") {
    import spark.implicits._
    val genDoc = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 99).map(i => s"w$i")).map(_.mkString(" ")))
    val texts = sample(genDoc, 200, seed = 41L).distinct
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.dedup.DedupQueries.chunkRelation(docs).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val ref = t.split(" ").grouped(8).map(_.mkString(" ")).toSeq
      assert(got(i.toLong) == ref, s"chunking mismatch on '${t.take(60)}'")
    }
  }

  test("Salting.salt is deterministic and lands in [0, n)") {
    import spark.implicits._
    val ids = sample(Gen.chooseNum(Long.MinValue, Long.MaxValue), 2000, seed = 43L)
    val df = ids.toDF("id")
      .select(graft.operators.Salting.salt(8, col("id")).as("s"))
    val once = df.collect().map(_.getLong(0)).toSeq
    assert(once.forall(s => s >= 0 && s < 8), "salt out of range")
    assert(once.toSet.size > 1, "salt degenerate — all rows in one bucket")
    val again = df.collect().map(_.getLong(0)).toSeq
    assert(once == again, "salt not deterministic across runs")
  }

  test("Canon.sumCents is exact where a double sum drifts") {
    import spark.implicits._
    // money values: k cents rendered as doubles (the parquet reality)
    val centsVals = sample(Gen.choose(-999999L, 999999L), 5000, seed = 31L)
    val exact = centsVals.sum
    val df = centsVals.map(_ / 100.0).toDF("v")
    val got = df.agg(graft.functions.Canon.sumCents(col("v"))).head().getLong(0)
    assert(got == exact, s"sumCents $got != exact $exact")
  }
}
