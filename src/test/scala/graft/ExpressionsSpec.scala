package graft

import graft.functions.{CosineSim, RollingHashMin}
import graft.similarity.SimilarityQueries
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
class ExpressionsSpec extends SparkTestBase {

  test("CosineSim matches the HOF formulation bitwise") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5, 0.25), Array(-1.0, 2.0, 0.0)),
      (Array(1e-8, 2e-8, -3e-8), Array(7.0, -2.0, 0.1))
    ).toDF("a", "b")
    val rows = df.select(
      CosineSim.cosineFast(col("a"), col("b")).as("fast"),
      SimilarityQueries.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("CosineSim known value") {
    import spark.implicits._
    val r = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
      .select(CosineSim.cosineFast(col("a"), col("b"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
  }

  test("CosineSim survives whole-stage codegen over parquet floats") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.select(CosineSim.cosineFast(col("embedding"), col("embedding")).as("c"))
      .filter(col("c") > 0.999999).count()
    assert(n == emb.count()) // self-similarity = 1 for every non-zero vector
  }

  private def naiveMinRolling(s: String, w: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val ww = math.min(w, bytes.length)
    (0 to bytes.length - ww).map { i =>
      bytes.slice(i, i + ww).foldLeft(0L)((h, b) => (h * 257 + (b & 0xff)) % 1000000007L)
    }.min
  }

  test("RollingHashMin equals naive window minimum (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val str = rnd.alphanumeric.take(rnd.nextInt(60)).mkString
      val w = 1 + rnd.nextInt(12)
      assert(RollingHashMin.compute(UTF8String.fromString(str), w) == naiveMinRolling(str, w),
        s"mismatch for str='$str' w=$w")
    }
  }

  test("RollingHashMin: equal fingerprint for content sharing the minimizing window") {
    val a = "the quick brown fox jumps over the lazy dog"
    // rolling min over byte windows is invariant under edits that don't
    // remove the minimizing window and don't introduce a smaller one —
    // check containment-monotonicity: min over superstring <= min over substring
    val base = RollingHashMin.compute(UTF8String.fromString(a), 8)
    val sup = RollingHashMin.compute(UTF8String.fromString(a + " postfix data"), 8)
    assert(sup <= base)
  }

  test("RollingHashMin edge cases: empty, shorter-than-window") {
    assert(RollingHashMin.compute(UTF8String.fromString(""), 8) == 0L)
    assert(RollingHashMin.compute(UTF8String.fromString("ab"), 8) == naiveMinRolling("ab", 8))
  }

  test("HammingDistance matches the substring-compare formulation; null on length mismatch") {
    import graft.functions.HammingDistance
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 100).map { _ =>
      val n = 16
      val a = Seq.fill(n)(if (rnd.nextBoolean()) '1' else '0').mkString
      val b = Seq.fill(n)(if (rnd.nextBoolean()) '1' else '0').mkString
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val folded = (0 until 16).map { j =>
      when(substring(col("a"), j + 1, 1) =!= substring(col("b"), j + 1, 1), 1).otherwise(0)
    }.reduce(_ + _)
    val out = df.select(
      HammingDistance.hammingDist(col("a"), col("b")).as("fast"),
      folded.as("folded")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // length mismatch → NULL (not a wrong count)
    val m = Seq(("0101", "01011")).toDF("a", "b")
      .select(HammingDistance.hammingDist(col("a"), col("b"))).head()
    assert(m.isNullAt(0))
  }

  test("hamming_dist is callable from SQL via GraftExtensions") {
    graft.core.GraftExtensions.register(spark)
    val r = spark.sql("SELECT hamming_dist('1010', '1001') AS h").head()
    assert(r.getInt(0) == 2)
  }

  test("ZOrder matches the 20-bit HOF-fold interleave (seeded sweep + edges)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(43)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFL, 0xFFFFFL)) ++
      Seq.fill(200)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val df = rows.toDF("a", "b")
    val folded = expr(
      """aggregate(sequence(0, 19), 0L, (acc, i) ->
        |  acc + shiftleft((a >> i) & 1, 2 * i)
        |      + shiftleft((b >> i) & 1, 2 * i + 1))""".stripMargin)
    val out = df.select(
      graft.functions.ZOrder.zorder(col("a"), col("b")).as("fast"),
      folded.as("folded")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // high bits beyond 20 are masked, not folded onto the prefix
    assert(graft.functions.ZOrder.interleave(1L << 20, 0L) == 0L)
  }

  test("zorder is callable from SQL via GraftExtensions") {
    graft.core.GraftExtensions.register(spark)
    // interleave(3, 1) = (spread 3 = 0b101) | (spread 1 << 1 = 0b10) = 0b111
    val r = spark.sql("SELECT zorder(3, 1) AS z").head()
    assert(r.getLong(0) == 7L)
  }
}

/** Misra-Gries frequent-items summary: the two theory guarantees the
  * q78 audit leans on, checked under an adversarial partitioning and
  * merge order (guarantees must hold for ANY — that's what makes the
  * audit booleans deterministic on a cluster). */
class FreqSketchSpec extends SparkTestBase {
  test("MG guarantees survive uneven partitions merged in reverse") {
    val agg = new graft.functions.FreqSketchAggregator(8)
    // one 20% hot key over a 97-key tail — hot is the only true heavy
    val stream = (0 until 5000).map(i => if (i % 5 == 4) "HOT" else s"t${i % 97}")
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    val bound = n / 9 // k=8 → error ≤ n/(k+1)
    // uneven chunks, merged tail-first — worst-case associativity probe
    val bufs = stream.grouped(717).map(_.foldLeft(agg.zero)(agg.reduce)).toList
    val merged = bufs.reverse.reduce(agg.merge)
    val res = agg.finish(merged).toMap
    assert(res.size <= 8, s"summary exceeded k entries: ${res.size}")
    exact.filter(_._2 > bound).keys.foreach { k =>
      assert(res.contains(k), s"true heavy '$k' missing from summary") }
    res.foreach { case (k, est) =>
      val ex = exact(k)
      assert(est <= ex && ex - est <= bound,
        s"estimate for '$k' out of bounds: est=$est exact=$ex bound=$bound")
    }
    // single-partition path agrees with the guarantee too
    val solo = agg.finish(stream.foldLeft(agg.zero)(agg.reduce)).toMap
    assert(solo.contains("HOT") && solo("HOT") <= exact("HOT"))
  }
}
