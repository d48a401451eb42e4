package graft

import java.nio.file.{Files, Paths}
import graft.multimodal.Codecs

/** One-off generator for the committed ffmpeg-adapter golden fixture
  * (`src/test/resources/ffmpeg_image2pipe_golden.bin`): three 24-bit
  * BMPs concatenated back-to-back — byte-identical in STRUCTURE to what
  * `ffmpeg -f image2pipe -vcodec bmp pipe:1` emits (the BMP writer there
  * produces the same standard BITMAPINFOHEADER stream; this box has no
  * ffmpeg to record from, which is exactly why the fixture exists).
  * Content is a pure function of (frame, x, y) — rerunning this main
  * reproduces the committed bytes bit-for-bit.
  *
  * Run: sbt "Test/runMain graft.GoldenFixtureGen"
  * It prints the golden luma anchors VideoSeamSpec hardcodes.
  */
object GoldenFixtureGen {
  val Width = 6
  val Height = 4
  val Frames = 3

  def frame(f: Int): Codecs.Image = {
    val px = new Array[Byte](Width * Height * 3)
    for (y <- 0 until Height; x <- 0 until Width) {
      val i = 3 * (y * Width + x)
      px(i) = ((10 * f + 3 * x) % 256).toByte          // B
      px(i + 1) = ((20 * f + 5 * y) % 256).toByte      // G
      px(i + 2) = ((40 * f + x * y + 7) % 256).toByte  // R
    }
    Codecs.Image(Width, Height, px)
  }

  def streamBytes: Array[Byte] =
    (0 until Frames).toArray.flatMap(f => Codecs.encodeBmp(frame(f)))

  def main(args: Array[String]): Unit = {
    val out = Paths.get("src/test/resources/ffmpeg_image2pipe_golden.bin")
    Files.createDirectories(out.getParent)
    Files.write(out, streamBytes)
    println(s"wrote ${streamBytes.length} bytes to $out")
    // print the luma anchors (BT.601 integer weights, the adapter's
    // toGray) for the spec to pin
    (0 until Frames).foreach { f =>
      val img = frame(f)
      val lumas = (0 until Width * Height).map { i =>
        val b = img.pixels(3 * i) & 0xff
        val g = img.pixels(3 * i + 1) & 0xff
        val r = img.pixels(3 * i + 2) & 0xff
        (r * 299 + g * 587 + b * 114) / 1000
      }
      println(s"frame $f: first=${lumas.head} last=${lumas.last} sum=${lumas.sum}")
    }
  }
}
