package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Adpcm, Avi, Codecs, Jpeg}

/** Cross-validation against an INDEPENDENT implementation: the JDK's own
  * ImageIO / javax.sound decoders (pure JDK, headless-safe, no added
  * dependency) read the bytes our encoders produce. Agreement here means
  * the files are genuinely conformant PNG/GIF/BMP/JPEG/WAV — not a
  * private dialect that only our own decoders understand.
  */
class CrossCodecSpec extends AnyFunSuite {

  private def imageio(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the stream")
    img
  }

  test("JDK ImageIO decodes our PNG to the exact same RGB pixels") {
    val (w, h) = (23, 11)
    val px = Array.tabulate[Byte](w * h * 3)(i => (i * 37 + 11).toByte)
    val bi = imageio(Codecs.encodePng(Codecs.Image(w, h, px)))
    assert(bi.getWidth == w && bi.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (px(o) & 0xff), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (px(o + 1) & 0xff), s"G at ($x,$y)")
      assert((rgb & 0xff) == (px(o + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("JDK ImageIO decodes our BMP to the exact same pixels (BGR order)") {
    val (w, h) = (17, 6) // odd width exercises row padding
    val px = Array.tabulate[Byte](w * h * 3)(i => (i * 53 + 7).toByte)
    val bi = imageio(Codecs.encodeBmp(Codecs.Image(w, h, px)))
    assert(bi.getWidth == w && bi.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      val o = (y * w + x) * 3 // our BMP pixels are BGR triplets
      assert((rgb & 0xff) == (px(o) & 0xff), s"B at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (px(o + 1) & 0xff), s"G at ($x,$y)")
      assert(((rgb >> 16) & 0xff) == (px(o + 2) & 0xff), s"R at ($x,$y)")
    }
  }

  test("JDK ImageIO decodes our GIF (hand-built LZW) to the exact palette indices") {
    val (w, h) = (40, 25) // 1000 indices: several dict growths
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 7 + i / 13) % 256).toByte)
    val bi = imageio(Codecs.encodeGif(Codecs.Gif(w, h, Codecs.GrayPalette, idx)))
    assert(bi.getWidth == w && bi.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = idx(y * w + x) & 0xff // identity gray palette
      val rgb = bi.getRGB(x, y)
      assert((rgb & 0xff) == expected && ((rgb >> 8) & 0xff) == expected &&
        ((rgb >> 16) & 0xff) == expected, s"palette index at ($x,$y)")
    }
  }

  test("JDK ImageIO decodes our JPEG within IDCT rounding of our own decoder") {
    val (w, h) = (64, 48)
    val px = Array.tabulate[Byte](w * h)(i => ((i % w) * 255 / (w - 1)).toByte)
    val bytes = Jpeg.encode(Jpeg.Gray(w, h, px))
    // readRaster returns the RAW decoded component samples — getRGB would
    // push grayscale through a linear-gray→sRGB gamma conversion and
    // compare color management, not the codec
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val raster = reader.readRaster(0, null)
    assert(raster.getWidth == w && raster.getHeight == h)
    val ours = Jpeg.decode(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val jdk = raster.getSample(x, y, 0)
      val our = ours.pixels(y * w + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(jdk - our))
    }
    // two independent IDCTs may round differently, but only just
    assert(maxDiff <= 2, s"JDK and our decoder disagree by $maxDiff")
    // and the JDK's reconstruction is faithful to the source
    val jdkPx = Array.tabulate[Byte](w * h)(i =>
      raster.getSample(i % w, i / w, 0).toByte)
    assert(Jpeg.psnr(Jpeg.Gray(w, h, px), Jpeg.Gray(w, h, jdkPx)) > 30.0)
  }

  // ---- the reverse direction: OUR decoders on FOREIGN-encoded files.
  // The JDK writers choose their own PNG scanline filters, their own GIF
  // LZW clear strategy, their own Huffman tables — reading them proves
  // the decoders handle the formats, not just our encoders' dialect.

  private def jdkEncode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
    out.toByteArray
  }

  test("our PNG decoder reads a JDK-encoded PNG pixel-exactly (foreign filter choices)") {
    val (w, h) = (37, 21)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 11) % 256 << 16) | ((y * 29) % 256 << 8) | ((x + y * 3) % 256))
    val ours = Codecs.decodePng(jdkEncode(bi, "png"))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      val o = (y * w + x) * 3 // our PNG pixel order is RGB
      assert((ours.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (ours.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (ours.pixels(o + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y)")
    }
  }

  test("our GIF decoder reads a JDK-encoded GIF89a (foreign LZW, extensions, small palette)") {
    val (w, h) = (50, 30)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13) % 256
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val gif = Codecs.decodeGif(jdkEncode(bi, "gif"))
    assert(gif.width == w && gif.height == h)
    // palette-resolve and compare against what the JDK itself re-reads
    val rere = imageio(jdkEncode(bi, "gif"))
    for (y <- 0 until h; x <- 0 until w) {
      val idx = gif.indices(y * w + x) & 0xff
      val ourGray = gif.palette(idx * 3) & 0xff
      assert(ourGray == (rere.getRGB(x, y) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("our BMP decoder reads a JDK-encoded BMP pixel-exactly") {
    val (w, h) = (19, 7) // odd width: foreign row padding
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 31) % 256 << 16) | ((y * 17) % 256 << 8) | ((x ^ y) % 256))
    val ours = Codecs.decodeBmp(jdkEncode(bi, "bmp"))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      val o = (y * w + x) * 3 // our BMP pixel order is BGR
      assert((ours.pixels(o) & 0xff) == (rgb & 0xff) &&
        (ours.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (ours.pixels(o + 2) & 0xff) == ((rgb >> 16) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("our JPEG decoder reads a JDK-encoded grayscale JPEG (foreign Huffman tables)") {
    val (w, h) = (64, 40)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 255 / (w - 1)
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = jdkEncode(bi, "jpg")
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h)
    // compare against the JDK's own raw-raster decode of the same stream
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val raster = reader.readRaster(0, null)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(raster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xff)))
    assert(maxDiff <= 2, s"decoders disagree by $maxDiff on a JDK-encoded stream")
  }

  test("JDK javax.sound decodes our WAV to the exact same PCM16 samples") {
    val samples = Array.tabulate[Short](3000)(i => ((i * 177 % 65536) - 32768).toShort)
    val bytes = Codecs.encodeWav(Codecs.Audio(16000, samples))
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val raw = in.readAllBytes()
    assert(raw.length == samples.length * 2)
    val got = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer()
    assert(samples.indices.forall(i => got.get(i) == samples(i)))
  }
}
