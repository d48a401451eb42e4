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
