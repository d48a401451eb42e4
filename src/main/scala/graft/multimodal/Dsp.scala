package graft.multimodal

/** Pure-JVM spectral analysis for the audio family — the feature-extract
  * step after decode ([[Codecs.decodeWav]]/[[Adpcm]]): an iterative
  * radix-2 Cooley–Tukey FFT and frame-level dominant-frequency
  * detection, the primitive under pitch tracking, tone/DTMF detection
  * and audio fingerprinting.
  *
  * Determinism: every transcendental goes through `StrictMath`
  * (fdlibm — bit-identical across JVMs/platforms, where `Math.sin` may
  * use platform intrinsics), and the FFT is a fixed sequence of IEEE
  * double ops per frame, so the same samples always produce the same
  * spectrum on any executor. Integer OUTPUTS (bin indices) make the
  * query gate robust: a planted integral-frequency tone lands its whole
  * energy in one bin, and argmax-with-lowest-bin-tie-break is stable
  * under any float jitter far smaller than the bin gap.
  *
  * Scale shape: per-row scalar work (frames never shuffle); a corpus
  * spectral pass pipelines with the media scan like the other decoders.
  */
object Dsp {

  /** In-place iterative radix-2 FFT (decimation in time, bit-reversal
    * permutation first). Length must be a power of two. Forward
    * transform, no normalization (Parseval: Σ|x|² = (1/N)·Σ|X|²,
    * DspSpec pins it).
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, s"re/im length mismatch: $n vs ${im.length}")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = StrictMath.cos(ang)
      val wi = StrictMath.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val er = re(base + k); val ei = im(base + k)
          val xr = re(base + k + half); val xi = im(base + k + half)
          val or0 = xr * cr - xi * ci
          val oi0 = xr * ci + xi * cr
          re(base + k) = er + or0; im(base + k) = ei + oi0
          re(base + k + half) = er - or0; im(base + k + half) = ei - oi0
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Power spectrum |X_k|² for bins 0..n/2 of one PCM16 frame. */
  def powerSpectrum(samples: Array[Short], from: Int, n: Int): Array[Double] = {
    require(from >= 0 && from + n <= samples.length,
      s"frame [$from, ${from + n}) outside ${samples.length} samples")
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = samples(from + i).toDouble; i += 1 }
    fft(re, im)
    val out = new Array[Double](n / 2 + 1)
    i = 0
    while (i <= n / 2) { out(i) = re(i) * re(i) + im(i) * im(i); i += 1 }
    out
  }

  /** Dominant NON-DC bin of one frame (argmax over bins 1..n/2; ties →
    * lowest bin — deterministic).
    */
  def dominantBin(samples: Array[Short], from: Int, n: Int): Int = {
    val p = powerSpectrum(samples, from, n)
    var best = 1
    var i = 2
    while (i < p.length) { if (p(i) > p(best)) best = i; i += 1 }
    best
  }

  /** Dominant bin of every FULL `frameSize` frame (trailing partial
    * frame dropped — it has different bin resolution).
    */
  def dominantBins(a: Codecs.Audio, frameSize: Int): Array[Int] = {
    val nFrames = a.samples.length / frameSize
    Array.tabulate(nFrames)(f => dominantBin(a.samples, f * frameSize, frameSize))
  }
}
