package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL media codecs in pure JVM byte manipulation — no codec library
  * needed, because BMP (BITMAPINFOHEADER, 24-bit BI_RGB) and WAV
  * (RIFF, PCM16) are uncompressed container formats. These replace the
  * decode stubs for every format implementable in-container; the stub
  * remains only as the documented plug-point for codec-dependent formats
  * (JPEG/MP4), whose libraries this container lacks.
  *
  * Layout references: the Windows BITMAPFILEHEADER/BITMAPINFOHEADER and
  * RIFF/WAVE specifications (public, stable since 1991). Everything is
  * little-endian; BMP pixel rows are stored bottom-up and padded to
  * 4-byte boundaries.
  */
object Codecs {

  /** Decoded image: BGR triplets, row-major, TOP-down (decode flips the
    * BMP's bottom-up storage).
    */
  case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  /** PCM16 mono audio. */
  case class Audio(sampleRate: Int, samples: Array[Short])

  private def rowStride(width: Int): Int = (width * 3 + 3) / 4 * 4

  // ---------------------------------------------------------------- BMP

  def encodeBmp(img: Image): Array[Byte] = {
    val stride = rowStride(img.width)
    val dataSize = stride * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putShort(0).putShort(0).putInt(54) // file header
    buf.putInt(40).putInt(img.width).putInt(img.height) // positive = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = img.height - 1
    while (y >= 0) { // bottom-up row order
      buf.put(img.pixels, y * img.width * 3, img.width * 3)
      var p = img.width * 3
      while (p < stride) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  def decodeBmp(bytes: Array[Byte]): Image = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B' && buf.get(1) == 'M', "not a BMP (missing BM magic)")
    val pixelOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    require(height > 0, "top-down BMPs (negative height) not produced by this encoder")
    require(buf.getShort(28) == 24, s"only 24-bit BI_RGB supported, got ${buf.getShort(28)} bpp")
    require(buf.getInt(30) == 0, "only uncompressed BI_RGB supported")
    val stride = rowStride(width)
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      // row y of the file is row (height-1-y) of the image (bottom-up)
      System.arraycopy(bytes, pixelOffset + y * stride,
        out, (height - 1 - y) * width * 3, width * 3)
      y += 1
    }
    Image(width, height, out)
  }

  /** Nearest-neighbor resize on decoded pixels — a REAL resize (the
    * kernel every image library starts from), not a byte-sampling stub.
    */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, s"target dims must be positive: ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        System.arraycopy(img.pixels, (sy * img.width + sx) * 3, out, (y * w + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  // ---------------------------------------------------------------- WAV

  def encodeWav(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(a.sampleRate).putInt(a.sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  def decodeWav(bytes: Array[Byte]): Audio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    // walk chunks: fmt may be followed by optional chunks before data
    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      // a corrupt/truncated chunk with a negative size would advance pos
      // by <= 0 and spin this loop forever — fail loud instead
      require(size >= 0, s"corrupt RIFF chunk '$id' at offset $pos: negative size $size")
      id match {
        case "fmt " =>
          require(buf.getShort(pos + 8) == 1, "only PCM supported")
          require(buf.getShort(pos + 10) == 1, "only mono supported")
          sampleRate = buf.getInt(pos + 12)
          require(buf.getShort(pos + 22) == 16, "only 16-bit supported")
        case "data" =>
          samples = Array.tabulate(size / 2)(i => buf.getShort(pos + 8 + i * 2))
        case _ => () // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    Audio(sampleRate, samples)
  }

  /** Exact integer signal energy Σ s² (fits in Long for any realistic
    * clip: 2^31 max per sample² × ~2^32 samples needs care, but at
    * ≤ 2^33 samples of ≤ 2^15 amplitude the sum stays < 2^63).
    */
  def energy(a: Audio): Long = a.samples.foldLeft(0L)((acc, s) => acc + s.toLong * s)

  /** Per-frame RMS over fixed windows — the standard audio feature
    * extraction shape (frame → window → statistic).
    */
  def frameRms(a: Audio, frameSize: Int): Array[Double] =
    a.samples.grouped(frameSize).map { fr =>
      math.sqrt(fr.foldLeft(0.0)((acc, s) => acc + s.toDouble * s) / fr.length)
    }.toArray
}
