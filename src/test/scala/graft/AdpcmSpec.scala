package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Adpcm, Codecs, Multimodal}

/** IMA ADPCM is a lossy integer state machine: the contract is exact
  * determinism, exact 4:1 stream size, exact silence, and an SNR bound
  * on smooth signals — plus the corpus path staying within a bounded
  * energy drift of the lossless WAV truth.
  */
class AdpcmSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]").getOrCreate()

  private def sine(n: Int, amp: Double, period: Double): Codecs.Audio =
    Codecs.Audio(16000, Array.tabulate[Short](n)(i =>
      (amp * math.sin(2 * math.Pi * i / period)).toShort))

  test("sine reconstruction above 20 dB SNR; counts and rate exact") {
    val a = sine(4000, 12000, 64)
    val back = Adpcm.decode(Adpcm.encode(a))
    assert(back.sampleRate == 16000 && back.samples.length == 4000)
    val s = Adpcm.snr(a, back)
    assert(s > 20.0, s"sine SNR $s dB")
  }

  test("silence is exact (minimum step quantizes zero diff to zero)") {
    val a = Codecs.Audio(16000, new Array[Short](1000))
    assert(Adpcm.decode(Adpcm.encode(a)).samples.forall(_ == 0))
  }

  test("stream is byte-deterministic and exactly 4:1 plus the 16-byte header") {
    val a = sine(5001, 8000, 37) // odd count exercises the half-filled byte
    val e1 = Adpcm.encode(a)
    assert(e1.sameElements(Adpcm.encode(a)))
    assert(e1.length == 16 + (5001 + 1) / 2)
    assert(Adpcm.decode(e1).samples.length == 5001)
    intercept[IllegalArgumentException](Adpcm.decode(e1.take(20)))
  }

  test("corpus path: exact sample counts, bounded energy drift vs lossless WAV truth") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    implicit val sp = spark
    val lossy = Multimodal.decodeAdpcmFeatures(Multimodal.adpcmFromDocuments(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val truth = Multimodal.decodeAudioFeatures(Multimodal.wavFromDocuments(docs)).collect()
    assert(truth.length == 500)
    truth.foreach { t =>
      val l = lossy(t.doc_id)
      assert(l.n_samples == t.n_samples, s"doc ${t.doc_id} sample count")
      // per-sample error is bounded by the adaptive step: energies must
      // stay within 2x of truth on text-derived (noisy) signals
      assert(l.energy > t.energy / 2 && l.energy < t.energy * 2,
        s"doc ${t.doc_id} energy drifted: ${l.energy} vs ${t.energy}")
    }
  }
}
