package graft

import graft.multimodal.{AudioCodec, ImageCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM contracts of the REAL multimodal codecs (no Spark session):
  * the closed forms the DuckDB oracles compute must be exactly what the
  * codecs recover from their own encoded bytes. */
class MultimodalCodecSpec extends AnyFunSuite {

  private def expectedSums(id: Long): (Long, Long, Long) = {
    val (w, h, c) = (ImageCodec.specW(id), ImageCodec.specH(id), ImageCodec.specC(id))
    val sr = h.toLong * (w.toLong * c + w.toLong * (w - 1) / 2)
    val sg = w.toLong * (h.toLong * c + h.toLong * (h - 1) / 2)
    val sb = w.toLong * h * c + h.toLong * (w.toLong * (w - 1) / 2) +
      w.toLong * (h.toLong * (h - 1) / 2)
    (sr, sg, sb)
  }

  test("PNG encode→decode reproduces closed-form channel sums exactly") {
    Seq(0L, 1L, 47L, 96L, 97L, 499L, 12345L).foreach { id =>
      val d = ImageCodec.decodeFeatures(id, ImageCodec.encodePng(id),
        ImageCodec.encodeJpeg(id))
      val (sr, sg, sb) = expectedSums(id)
      assert(d.width == ImageCodec.specW(id) && d.height == ImageCodec.specH(id))
      assert(d.channels == 3)
      assert((d.sum_r, d.sum_g, d.sum_b) == ((sr, sg, sb)),
        s"id=$id decoded sums ${(d.sum_r, d.sum_g, d.sum_b)} != ${(sr, sg, sb)}")
    }
  }

  test("JPEG decode: exact geometry, bounded luma drift (lossy contract)") {
    Seq(3L, 250L, 499L).foreach { id =>
      val d = ImageCodec.decodeFeatures(id, ImageCodec.encodePng(id),
        ImageCodec.encodeJpeg(id))
      assert(d.jpeg_w == ImageCodec.specW(id) && d.jpeg_h == ImageCodec.specH(id))
      assert(d.luma_ok, s"id=$id JPEG mean luma drifted > 8/255 from PNG")
    }
  }

  test("resize fits the 224 box, preserves aspect, survives re-decode") {
    Seq(0L, 31L, 499L).foreach { id =>
      val r = ImageCodec.resize224(id, ImageCodec.encodePng(id))
      val (w, h) = (ImageCodec.specW(id), ImageCodec.specH(id))
      val (ew, eh) =
        if (w >= h) (224, h * 224 / w) else (w * 224 / h, 224)
      assert((r.out_w, r.out_h) == ((ew, eh)), s"id=$id got ${(r.out_w, r.out_h)}")
      assert(r.in_w == w && r.in_h == h && r.resample_ok)
    }
  }

  test("WAV encode→decode reproduces header fields and period-exact PCM sums") {
    Seq(0L, 7L, 255L, 499L).foreach { id =>
      val a = AudioCodec.decodeMeta(id, AudioCodec.encodeWav(id))
      val n = AudioCodec.specFrames(id).toLong
      assert(a.sample_rate == 8000 && a.channels == 1 && a.bits == 16)
      assert(a.n_frames == n)
      assert(a.sum_pcm == -128L * n, s"id=$id sum ${a.sum_pcm} != ${-128L * n}")
      assert(a.sumsq_pcm == (n / 256) * 1398144L * 65536L,
        s"id=$id sumsq ${a.sumsq_pcm}")
    }
  }

  test("dHash: planted variants land near, different bases land far (mm08 kernel)") {
    def dh(id: Long) = ImageCodec.dhashFromPng(ImageCodec.encodeBlockPng(id))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    (0L until 4L).foreach { base =>
      val v0 = dh(base * 4)
      assert(v0.length == 64 && v0.forall(c => c == '0' || c == '1'))
      // variant 1 perturbs ONE block → at most 2 adjacent comparisons flip
      assert(hamming(v0, dh(base * 4 + 1)) <= 2)
      // variant 2 perturbs two blocks → ≤ 4 bits
      assert(hamming(v0, dh(base * 4 + 2)) <= 4)
      // variant 3 is an unrelated image → far outside the ≤4 verify gate
      assert(hamming(v0, dh(base * 4 + 3)) > 4)
      // different bases are uncorrelated
      assert(hamming(v0, dh((base + 1) * 4)) > 4)
    }
    // decode really drives the hash: PNG bytes, not the id, are hashed
    assert(dh(0) == ImageCodec.dhashFromPng(ImageCodec.encodeBlockPng(0)))
  }

  test("mm10 fire kernel: emission policy exact, overlay re-encode closed-form") {
    Seq(0L, 1L, 4L, 5L, 47L, 96L, 97L, 127L, 499L).foreach { id =>
      val d = ImageCodec.fireDetect(id, ImageCodec.encodePng(id))
      val (w, h, c) = (ImageCodec.specW(id).toLong, ImageCodec.specH(id).toLong,
        ImageCodec.specC(id).toLong)
      val (sr, _, _) = expectedSums(id)
      val k = math.min(w, 128 - c) // non-fire pixels per row (r = c+x > 127)
      val firePx = h * (w - k)
      assert(d.fire_pct_e4 == 10000L * firePx / (w * h), s"id=$id fire pct")
      assert(d.conf_e4 == 10000L * sr / (255L * w * h), s"id=$id confidence")
      assert(d.fire_detected == (d.fire_pct_e4 > 100), s"id=$id detect rule")
      // the reference's emission rule (save every 5th OR on detection,
      // fire_consumer_streaming.py:157,192): image present iff either
      assert(d.image_emitted == (id % 5 == 0 || d.fire_detected), s"id=$id policy")
      assert(d.overlay_sum_r.isDefined == d.image_emitted, s"id=$id null contract")
      d.overlay_sum_r.foreach { got =>
        val expect = h * (k * c + k * (k - 1) / 2) + 255L * h * (w - k)
        assert(got == expect, s"id=$id overlay sum $got != $expect")
      }
    }
    // both emission triggers must be exercised by the fixture ids above
    val ds = (0L to 499L).map(id => ImageCodec.fireDetect(id, ImageCodec.encodePng(id)))
    assert(ds.exists(d => d.image_emitted && !d.fire_detected), "every-5th-only emission")
    assert(ds.exists(d => d.image_emitted && d.fire_detected && d.doc_id % 5 != 0),
      "detection-only emission")
    assert(ds.exists(!_.image_emitted), "suppressed emission")
  }

  test("fixture dir materializes 64 PNGs once and is idempotent") {
    val d1 = ImageCodec.ensureFixtureDir()
    val files = new java.io.File(d1).listFiles().filter(_.getName.endsWith(".png"))
    assert(files.length == 64)
    val mtimes = files.map(f => f.getName -> f.lastModified).toMap
    val d2 = ImageCodec.ensureFixtureDir() // second call must be a no-op
    assert(d2 == d1)
    val after = new java.io.File(d2).listFiles()
      .filter(_.getName.endsWith(".png")).map(f => f.getName -> f.lastModified).toMap
    assert(after == mtimes, "fixture files were rewritten on re-entry")
  }
}
