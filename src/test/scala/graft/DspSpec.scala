package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Codecs, Dsp, Multimodal}

/** The from-scratch FFT: equality with an independent O(n²) DFT, the
  * Parseval energy invariant, planted-tone recovery, and the q154
  * end-to-end loop.
  */
class DspSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]").getOrCreate()

  /** Naive DFT — shares no code with the FFT's butterfly/bit-reversal. */
  private def dft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * StrictMath.cos(ang)
      im(k) += x(t) * StrictMath.sin(ang)
    }
    (re, im)
  }

  /** Deterministic pseudo-random samples (integer mixer, no RNG state). */
  private def samples(n: Int, seed: Long): Array[Double] =
    Array.tabulate(n)(i => (((i + seed) * 2654435761L) % 20011 - 10005).toDouble)

  test("FFT equals the naive DFT on deterministic inputs (64 and 256 points)") {
    for (n <- Seq(64, 256)) {
      val x = samples(n, seed = n)
      val (wr, wi) = dft(x)
      val re = x.clone(); val im = new Array[Double](n)
      Dsp.fft(re, im)
      val scale = x.map(math.abs).max * n
      for (k <- 0 until n) {
        assert(math.abs(re(k) - wr(k)) <= 1e-9 * scale &&
          math.abs(im(k) - wi(k)) <= 1e-9 * scale,
          s"n=$n bin $k: FFT (${re(k)}, ${im(k)}) vs DFT (${wr(k)}, ${wi(k)})")
      }
    }
  }

  test("Parseval: time-domain energy equals (1/N) * spectral energy") {
    val n = 512
    val x = samples(n, seed = 7)
    val re = x.clone(); val im = new Array[Double](n)
    Dsp.fft(re, im)
    val timeE = x.map(v => v * v).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) <= 1e-9 * timeE,
      s"Parseval violated: $timeE vs $freqE")
  }

  test("planted tones land in exactly their bin; the stronger of two tones wins") {
    val n = 128
    for (bin <- Seq(1, 4, 17, 33, 63)) {
      val tone = Array.tabulate(n)(i =>
        (8000.0 * StrictMath.sin(2.0 * math.Pi * bin * i / n)).toShort)
      assert(Dsp.dominantBin(tone, 0, n) == bin, s"tone at bin $bin missed")
    }
    val mixed = Array.tabulate(n)(i =>
      (6000.0 * StrictMath.sin(2.0 * math.Pi * 9 * i / n) +
        2000.0 * StrictMath.sin(2.0 * math.Pi * 25 * i / n)).toShort)
    assert(Dsp.dominantBin(mixed, 0, n) == 9, "stronger tone must dominate")
    // framing: two frames with different tones report each its own
    val twoFrames = Array.tabulate(2 * n) { i =>
      val b = if (i < n) 5 else 40
      (8000.0 * StrictMath.sin(2.0 * math.Pi * b * (i % n) / n)).toShort
    }
    assert(Dsp.dominantBins(Codecs.Audio(16000, twoFrames), n).toSeq == Seq(5, 40))
  }

  test("FFT rejects non-power-of-two lengths loudly") {
    assertThrows[IllegalArgumentException](
      Dsp.fft(new Array[Double](96), new Array[Double](96)))
  }

  test("q154 end-to-end: every document's frames detect the planted (doc_id % 60) + 4 bin") {
    import spark.implicits._
    val got = SparkEntry.queries("q154_audio_spectral")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, String)].collect()
    assert(got.length == 500)
    got.foreach { case (id, nFrames, bins) =>
      val want = (id % 60 + 4).toString
      assert(nFrames == 16 && bins.split(",").forall(_ == want),
        s"doc $id: expected all-frame bin $want, got $bins")
    }
  }
}
