package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** IMA ADPCM (DVI4) codec for PCM16 mono audio, pure JVM — the classic
  * 4-bits-per-sample (4:1) adaptive differential codec: an integer state
  * machine (predictor + step-table index) with NO floating point, so
  * encode and decode are exactly deterministic. Lossy like JPEG, so the
  * verification story is spec-based: byte-deterministic round-trip, an
  * SNR bound on reconstruction, and exact stream-structure checks.
  *
  * Container: a minimal framed stream — magic "ADP1", sample rate,
  * sample count, initial predictor/index, then packed nibbles (low
  * nibble first). One continuous block; real-world block-per-chunk
  * framing adds seek points but identical per-sample math.
  */
object Adpcm {

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Shared per-nibble state transition (T.801-style reference flow):
    * reconstruct the difference the nibble encodes, update predictor and
    * step index. Returns the new predictor; mutates nothing.
    */
  @inline private def step(nibble: Int, predictor: Int, index: Int): (Int, Int) = {
    val s = StepTable(index)
    var diff = s >> 3
    if ((nibble & 1) != 0) diff += s >> 2
    if ((nibble & 2) != 0) diff += s >> 1
    if ((nibble & 4) != 0) diff += s
    val p = if ((nibble & 8) != 0) predictor - diff else predictor + diff
    val clamped = math.max(-32768, math.min(32767, p))
    val idx = math.max(0, math.min(88, index + IndexTable(nibble)))
    (clamped, idx)
  }

  def encode(audio: Codecs.Audio): Array[Byte] = {
    val samples = audio.samples
    var predictor = 0
    var index = 0
    val nibbles = new Array[Byte]((samples.length + 1) / 2)
    var i = 0
    while (i < samples.length) {
      val s = StepTable(index)
      var diff = samples(i) - predictor
      var nibble = 0
      if (diff < 0) { nibble = 8; diff = -diff }
      var temp = s
      if (diff >= temp) { nibble |= 4; diff -= temp }
      temp >>= 1
      if (diff >= temp) { nibble |= 2; diff -= temp }
      temp >>= 1
      if (diff >= temp) nibble |= 1
      val (p2, i2) = step(nibble, predictor, index) // decoder-identical update
      predictor = p2; index = i2
      if ((i & 1) == 0) nibbles(i / 2) = nibble.toByte
      else nibbles(i / 2) = (nibbles(i / 2) | (nibble << 4)).toByte
      i += 1
    }
    val buf = ByteBuffer.allocate(16 + nibbles.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("ADP1".getBytes("US-ASCII"))
      .putInt(audio.sampleRate).putInt(samples.length)
      .putShort(0).putShort(0) // initial predictor / index (always 0 here)
      .put(nibbles)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Codecs.Audio = {
    require(bytes.length >= 16 && new String(bytes, 0, 4, "US-ASCII") == "ADP1",
      "not an ADP1 stream")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val rate = buf.getInt(4)
    val n = buf.getInt(8)
    // bound check in Long arithmetic: with n == Int.MaxValue the Int form
    // overflows, passes, and then OOMs on a ~4 GB allocation below
    require(n >= 0 && 16L + (n.toLong + 1) / 2 <= bytes.length, s"truncated ADP1 stream (n=$n)")
    var predictor: Int = buf.getShort(12)
    var index: Int = buf.getShort(14)
    require(index >= 0 && index <= 88, s"initial step index out of range: $index")
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val byte = bytes(16 + i / 2) & 0xff
      val nibble = if ((i & 1) == 0) byte & 0x0f else byte >> 4
      val (p2, i2) = step(nibble, predictor, index)
      predictor = p2; index = i2
      out(i) = p2.toShort
      i += 1
    }
    Codecs.Audio(rate, out)
  }

  /** Signal-to-noise ratio (dB) of a reconstruction against the source. */
  def snr(orig: Codecs.Audio, rec: Codecs.Audio): Double = {
    require(orig.samples.length == rec.samples.length, "length mismatch")
    var sig = 0.0
    var err = 0.0
    var i = 0
    while (i < orig.samples.length) {
      val o = orig.samples(i).toDouble
      val d = o - rec.samples(i)
      sig += o * o; err += d * d
      i += 1
    }
    if (err == 0.0) Double.PositiveInfinity else 10.0 * math.log10(sig / err)
  }
}
