package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Codecs, Multimodal, Phash}

/** DCT perceptual hash (q82): the invariances that make it a *perceptual*
  * hash — brightness-offset invariance (offsets move only the DC term,
  * which pHash drops) and small-noise tolerance — plus banded-join recall
  * on planted near-dups and selectivity on unrelated images.
  */
class PhashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private def gradient(seed: Int): Codecs.Image = {
    val w = 16; val h = 24
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = (((i * 31 + seed * 7) % 180)).toByte; i += 1 }
    Codecs.Image(w, h, px)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical images hash identically") {
    assert(Phash.phash(gradient(1)) == Phash.phash(gradient(1)))
  }

  test("brightness offset leaves the hash unchanged (DC-only shift)") {
    val img = gradient(2)
    val brighter = Codecs.Image(img.width, img.height,
      img.pixels.map(b => ((b & 0xff) + 40).toByte)) // 180+40 < 256: no wrap
    assert(Phash.phash(img) == Phash.phash(brighter))
  }

  test("small pixel noise stays within hamming 3; unrelated images do not") {
    val img = gradient(3)
    val noisy = {
      val px = img.pixels.clone()
      for (i <- Seq(5, 100, 333)) px(i) = ((px(i) & 0xff) + 2).toByte
      Codecs.Image(img.width, img.height, px)
    }
    val hNoise = hamming(Phash.phash(img), Phash.phash(noisy))
    assert(hNoise <= 3, s"noisy copy drifted to hamming $hNoise")
    val hFar = hamming(Phash.phash(gradient(3)), Phash.phash(gradient(40)))
    assert(hFar > 3, s"unrelated images landed at hamming $hFar")
  }

  test("banded candidate join finds planted near-dups exactly (recall 1 at hamming<=3)") {
    import spark.implicits._
    val base = 0x0f0f0f0f0f0f0f0L
    val fps = Seq(
      (1L, base),
      (2L, base ^ 1L),          // hamming 1 from doc 1
      (3L, base ^ 0x7L),        // hamming 3 from doc 1 (hamming 2 from doc 2)
      (4L, base ^ 0xf000000f000L) // hamming 8: outside threshold
    ).toDF("doc", "fp")
    val got = Phash.nearPairs(fps, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $got")
  }

  test("q82 over the documents fixture: exact-dup docs surface at hamming 0, pairs are few") {
    val dir = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("q82_phash_neardup")(spark, dir).collect()
    assert(pairs.nonEmpty, "expected at least the exact-duplicate documents to pair up")
    assert(pairs.exists(_.getLong(2) == 0L), "no hamming-0 pair despite exact dup docs")
    val nDocs = Tables.documents(spark, dir).count()
    assert(pairs.length < nDocs * 4, s"pHash pairing degenerated: ${pairs.length} pairs for $nDocs docs")
  }
}
