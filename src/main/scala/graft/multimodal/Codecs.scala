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

  // ---------------------------------------------------------------- PNG
  //
  // A COMPRESSED format in pure JVM: PNG's container is chunks with CRC32
  // and its compression is zlib (RFC 1950), both in java.util.zip — only
  // the scanline filters (PNG spec §9, incl. the Paeth predictor) need
  // hand implementation. Scope: 8-bit truecolor RGB (color type 2),
  // non-interlaced — the exact subset the encoder below emits. Pixel
  // bytes in [[Image]] are RGB for PNG (channel order never matters to
  // the per-byte features we extract; dims and sums are order-agnostic).

  private val pngSignature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Paeth predictor (PNG spec §9.4): pick whichever of left/up/up-left
    * is closest to left + up − upLeft, tie-breaking in that order.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, chunkType: String,
                         data: Array[Byte]): Unit = {
    out.write(ByteBuffer.allocate(4).putInt(data.length).array())
    val typeBytes = chunkType.getBytes("US-ASCII")
    out.write(typeBytes)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typeBytes); crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode 8-bit RGB non-interlaced PNG. The filter type CYCLES 0..4 by
    * row, so any image of height ≥ 5 forces a decoder through every
    * unfilter path (None/Sub/Up/Average/Paeth) — that is what makes the
    * q50 oracle a test of the full filter suite, not just the container.
    */
  def encodePng(img: Image): Array[Byte] = {
    val bpp = 3
    val stride = img.width * bpp
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = y % 5
      raw((stride + 1) * y) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) img.pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw((stride + 1) * y + 1 + x) = filtered.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    val idat = new java.io.ByteArrayOutputStream()
    try {
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    } finally deflater.end()
    val ihdr = ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSignature)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", idat.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- GIF
  //
  // GIF87a with a 256-entry global color table, single image, no
  // interlace. Unlike PNG (zlib via java.util.zip), GIF's LZW has NO JVM
  // library — the variable-width LSB-first code stream, dictionary
  // growth, and CLEAR-on-full reset below are implemented from scratch
  // per the GIF87a specification's LZW appendix. Lossless, so decoded
  // pixel features stay exactly oracle-predictable (q56).

  /** Palette-indexed image: one byte per pixel, `palette` is 256 RGB
    * triplets (768 bytes).
    */
  case class Gif(width: Int, height: Int, palette: Array[Byte], indices: Array[Byte]) {
    require(palette.length == 768, s"palette must be 256*3 bytes, got ${palette.length}")
    require(indices.length == width * height,
      s"index buffer ${indices.length} != $width x $height")
  }

  /** Identity grayscale palette: entry i = (i, i, i) — palette lookup of
    * any channel returns the index byte itself.
    */
  val GrayPalette: Array[Byte] =
    Array.tabulate[Byte](768)(i => (i / 3).toByte)

  private final val GifMinCodeSize = 8  // 256-color images
  private final val GifClear = 256
  private final val GifEoi = 257
  private final val GifMaxDict = 4096

  /** LSB-first variable-width bit stream writer (the GIF packing order). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(code: Int, size: Int): Unit = {
      cur |= code << nbits
      nbits += size
      while (nbits >= 8) { out.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    def finish(): Array[Byte] = { if (nbits > 0) out.write(cur & 0xff); out.toByteArray }
  }

  /** GIF-variant LZW: starts with CLEAR, grows code width 9→12 bits as
    * the dictionary fills, emits CLEAR + resets when it reaches 4096
    * entries, ends with EOI.
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    val dict = new java.util.HashMap[String, Integer]()
    var next = GifEoi + 1
    var codeSize = GifMinCodeSize + 1
    def codeOf(s: String): Int =
      if (s.length == 1) s.charAt(0) else dict.get(s).intValue()
    bw.write(GifClear, codeSize)
    var w = ""
    var i = 0
    while (i < data.length) {
      val k = (data(i) & 0xff).toChar
      val wk = w + k
      if (w.isEmpty) w = wk
      else if (wk.length > 1 && dict.containsKey(wk)) w = wk
      else {
        bw.write(codeOf(w), codeSize)
        dict.put(wk, next); next += 1
        if (next > (1 << codeSize) && codeSize < 12) codeSize += 1
        w = k.toString
        if (next == GifMaxDict) { // full: clear and start a fresh dictionary
          bw.write(GifClear, codeSize)
          dict.clear(); next = GifEoi + 1; codeSize = GifMinCodeSize + 1
        }
      }
      i += 1
    }
    if (w.nonEmpty) bw.write(codeOf(w), codeSize)
    bw.write(GifEoi, codeSize)
    bw.finish()
  }

  private def lzwDecode(bytes: Array[Byte], expected: Int,
                        minCodeSize: Int = GifMinCodeSize): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    val dict = new java.util.HashMap[Integer, String]()
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var acc = 0L
    var nbits = 0
    var pos = 0
    var prev: String = null
    def seqOf(c: Int): String =
      if (c < clear) c.toChar.toString
      else { val s = dict.get(c); require(s != null, s"LZW code $c not in dictionary"); s }
    var done = false
    while (!done) {
      while (nbits < codeSize && pos < bytes.length) {
        acc |= (bytes(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      // a stream may simply end after the last full code (some encoders
      // omit EOI); stop if no further code fits
      if (nbits < codeSize) {
        require(prev != null, "truncated LZW stream (no output before it ended)")
        done = true
      } else {
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; nbits -= codeSize
      if (code == clear) {
        dict.clear(); next = eoi + 1; codeSize = minCodeSize + 1; prev = null
      } else if (code == eoi) {
        done = true
      } else {
        val seq =
          if (code < next) seqOf(code)
          else {
            // KwKwK: the one code the encoder can emit before the decoder
            // has added it — it is always prev + prev.head
            require(code == next && prev != null, s"LZW code $code out of range (next=$next)")
            prev + prev.charAt(0)
          }
        seq.foreach(c => out.write(c & 0xff))
        if (prev != null) {
          dict.put(next, prev + seq.charAt(0)); next += 1
          // "early change": the decoder's dictionary runs one entry
          // behind the encoder's (no add on the first code after CLEAR),
          // so its width bump fires one entry earlier to stay bit-aligned
          if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = seq
      }
      }
    }
    out.toByteArray
  }

  def encodeGif(img: Gif): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    // logical screen descriptor: dims, global color table present, 256 entries
    out.write(img.width & 0xff); out.write((img.width >> 8) & 0xff)
    out.write(img.height & 0xff); out.write((img.height >> 8) & 0xff)
    out.write(0xF7) // GCT present, 8 bits/channel, 2^(7+1)=256 entries
    out.write(0); out.write(0) // background index, aspect
    out.write(img.palette)
    out.write(0x2C) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(img.width & 0xff); out.write((img.width >> 8) & 0xff)
    out.write(img.height & 0xff); out.write((img.height >> 8) & 0xff)
    out.write(0) // no local color table, no interlace
    out.write(GifMinCodeSize)
    val lzw = lzwEncode(img.indices)
    var off = 0
    while (off < lzw.length) { // data sub-blocks, max 255 bytes each
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  def decodeGif(bytes: Array[Byte]): Gif = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"), "not a GIF (bad magic)")
    val width = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val height = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    val flags = bytes(10) & 0xff
    var pos = 13
    var palette: Array[Byte] = null
    if ((flags & 0x80) != 0) { // global color table, any size, padded to 256
      val gctSize = 2 << (flags & 0x07)
      palette = java.util.Arrays.copyOf(
        java.util.Arrays.copyOfRange(bytes, pos, pos + gctSize * 3), 768)
      pos += gctSize * 3
    }
    // skip GIF89a extension blocks (0x21 introducer + label + sub-blocks)
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) {
      pos += 2
      var bl = bytes(pos) & 0xff
      pos += 1
      while (bl != 0) { pos += bl; bl = bytes(pos) & 0xff; pos += 1 }
    }
    require(pos < bytes.length && (bytes(pos) & 0xff) == 0x2C,
      s"expected image descriptor at $pos")
    val iw = (bytes(pos + 5) & 0xff) | ((bytes(pos + 6) & 0xff) << 8)
    val ih = (bytes(pos + 7) & 0xff) | ((bytes(pos + 8) & 0xff) << 8)
    require(iw == width && ih == height, "sub-rectangle images not supported")
    val idFlags = bytes(pos + 9) & 0xff
    val interlaced = (idFlags & 0x40) != 0
    pos += 10
    if ((idFlags & 0x80) != 0) { // local color table overrides the global
      val lctSize = 2 << (idFlags & 0x07)
      palette = java.util.Arrays.copyOf(
        java.util.Arrays.copyOfRange(bytes, pos, pos + lctSize * 3), 768)
      pos += lctSize * 3
    }
    require(palette != null, "no global or local color table present")
    val minCodeSize = bytes(pos) & 0xff
    require(minCodeSize >= 2 && minCodeSize <= 8, s"bad LZW min code size $minCodeSize")
    pos += 1
    val lzw = new java.io.ByteArrayOutputStream()
    var blockLen = bytes(pos) & 0xff
    pos += 1
    while (blockLen != 0) { // concatenate data sub-blocks
      lzw.write(bytes, pos, blockLen)
      pos += blockLen
      blockLen = bytes(pos) & 0xff
      pos += 1
    }
    val decoded = lzwDecode(lzw.toByteArray, width * height, minCodeSize)
    require(decoded.length == width * height,
      s"LZW decoded ${decoded.length} pixels, expected ${width * height}")
    val indices =
      if (!interlaced) decoded
      else { // GIF87a Adam-style 4-pass interlace is a pure row reordering
        val out = new Array[Byte](decoded.length)
        var src = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
             y <- start until height by step) {
          System.arraycopy(decoded, src * width, out, y * width, width)
          src += 1
        }
        out
      }
    Gif(width, height, palette, indices)
  }

  /** Decode 8-bit RGB non-interlaced PNG: signature check, chunk walk
    * with per-chunk CRC32 verification (ancillary chunks skipped, IDAT
    * concatenated per spec), zlib inflate, then per-row unfilter of all
    * five filter types. Fails loud on truncation, CRC mismatch, or any
    * feature outside the supported subset.
    */
  def decodePng(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8 && pngSignature.indices.forall(i => bytes(i) == pngSignature(i)),
      "not a PNG (bad signature)")
    val buf = ByteBuffer.wrap(bytes) // PNG ints are big-endian, the buffer default
    var pos = 8
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd && pos + 8 <= bytes.length) {
      val len = buf.getInt(pos)
      val chunkType = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"truncated or corrupt $chunkType chunk at offset $pos (len $len)")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == buf.getInt(pos + 8 + len),
        s"CRC mismatch in $chunkType chunk")
      chunkType match {
        case "IHDR" =>
          width = buf.getInt(pos + 8); height = buf.getInt(pos + 12)
          require(bytes(pos + 16) == 8, s"only bit depth 8 supported, got ${bytes(pos + 16)}")
          require(bytes(pos + 17) == 2, s"only truecolor RGB supported, got color type ${bytes(pos + 17)}")
          require(bytes(pos + 20) == 0, "interlaced (Adam7) PNGs not supported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => seenEnd = true
        case _      => () // ancillary chunk (tEXt, pHYs, ...): skip per spec
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0 && idat.size > 0, "missing IHDR or IDAT chunk")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(n > 0 || inflater.finished(), "truncated or corrupt IDAT zlib stream")
        off += n
      }
      require(off == raw.length, s"IDAT inflated to $off bytes, expected ${raw.length}")
    } finally inflater.end()
    val out = new Array[Byte](stride * height)
    val bpp = 3
    var y = 0
    while (y < height) {
      val ft = raw((stride + 1) * y) & 0xff
      var x = 0
      while (x < stride) {
        val f = raw((stride + 1) * y + 1 + x) & 0xff
        val left = if (x >= bpp) out(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out((y - 1) * stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, upLeft)
          case other => throw new IllegalArgumentException(
            s"unknown PNG filter type $other at row $y")
        }
        out(y * stride + x) = v.toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, out)
  }
}
