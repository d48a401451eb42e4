package graft.multimodal

import java.nio.file.{Files, Paths}

/** Real EXTERNAL-codec adapter for [[VideoSeam]]: an `ffmpeg` binary
  * discovered on PATH decodes whatever containers/codecs it was built
  * with (MP4/H.264 included) and this adapter carries the frames back
  * through the seam's contract — proving the factory/quarantine design
  * holds for a genuinely non-JVM decoder, not just the in-repo codecs.
  *
  * Shape of the adapter (why each piece looks the way it does):
  *   - discovery is an executable probe over PATH, once per JVM — no
  *     config, no hard dependency; boxes without ffmpeg simply report
  *     `available = false` and the spec self-skips.
  *   - the container is handed to ffmpeg through a TEMP FILE, not a
  *     stdin pipe: ISO-BMFF with a trailing moov atom is not streamable,
  *     and a seekable input is the contract real demuxers assume.
  *   - frames come back as one concatenated stream of uncompressed
  *     24-bit BMPs (`-f image2pipe -vcodec bmp`): ffmpeg does the codec
  *     work, the in-repo [[Codecs.decodeBmp]] does the (trivial,
  *     fully-specified) container parse — no pixel-format guessing, and
  *     the BMP header's own size field delimits frames.
  *   - stderr goes to a file, never a pipe read after stdout: a full
  *     stderr pipe buffer would deadlock the child (classic Process
  *     trap); `-v error` keeps it to the message the quarantine row
  *     carries.
  *   - any nonzero exit / empty output / malformed BMP throws, and
  *     [[VideoSeam.sampleFramesSafe]] turns that into an `ok = false`
  *     row — one rotten MP4 in 100 TB costs one quarantine row, not a
  *     stage retry storm.
  *
  * The factory captures only the binary PATH STRING, so the closure
  * Spark ships is trivially serializable and each partition builds its
  * own adapter (per-partition init is where a heavier binding — javacv,
  * a hardware context — would hold native state).
  */
object FfmpegVideoDecoder {

  /** First executable `ffmpeg` on PATH, probed once per JVM. */
  lazy val locate: Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .iterator.filter(_.nonEmpty)
      .map(p => Paths.get(p, "ffmpeg"))
      .find(p => Files.isRegularFile(p) && Files.isExecutable(p))
      .map(_.toString)

  /** Whether a real external codec is present on this box. */
  def available: Boolean = locate.isDefined

  /** Per-partition decoder factory for [[VideoSeam.sampleFramesSafe]].
    * Fails LOUDLY at driver time when ffmpeg is absent — a missing
    * binary must never surface as 100% quarantined rows at task time.
    */
  def factory(): () => VideoSeam.VideoDecoder = {
    val bin = locate.getOrElse(throw new IllegalStateException(
      "ffmpeg not found on PATH — FfmpegVideoDecoder.available is the guard; " +
        "use VideoSeam.MjpegAviDecoder for the pure-JVM path"))
    () => new Adapter(bin)
  }

  private final class Adapter(bin: String) extends VideoSeam.VideoDecoder {
    def decode(container: Array[Byte]): Iterator[Jpeg.Gray] = {
      val tmp = Files.createTempFile("graft-ffmpeg-in", ".bin")
      val errF = Files.createTempFile("graft-ffmpeg-err", ".txt")
      try {
        Files.write(tmp, container)
        val pb = new ProcessBuilder(bin, "-v", "error", "-nostdin",
          "-i", tmp.toString, "-f", "image2pipe", "-vcodec", "bmp", "pipe:1")
        pb.redirectError(errF.toFile)
        val proc = pb.start()
        val out = proc.getInputStream.readAllBytes()
        val rc = proc.waitFor()
        if (rc != 0 || out.isEmpty) {
          val err = new String(Files.readAllBytes(errF), "UTF-8").trim
          throw new IllegalArgumentException(
            s"ffmpeg exit $rc, ${out.length} bytes out: ${err.take(200)}")
        }
        parseStream(out)
      } finally {
        Files.deleteIfExists(tmp)
        Files.deleteIfExists(errF)
      }
    }
  }

  /** The ENTIRE post-process half of the adapter — concatenated-BMP
    * stream → gray frames — factored out of the process invocation so it
    * runs everywhere: VideoSeamSpec drives it through a COMMITTED golden
    * fixture (`ffmpeg_image2pipe_golden.bin`, a concatenated 24-bit BMP
    * stream byte-identical in structure to `-f image2pipe -vcodec bmp`
    * output) on boxes without the binary. Only the exec itself remains
    * behind the availability self-skip.
    */
  private[graft] def parseStream(out: Array[Byte]): Iterator[Jpeg.Gray] =
    splitBmps(out).map(b => toGray(Codecs.decodeBmp(b)))

  /** Split a concatenated BMP stream on each header's own file-size
    * field (offset 2, little-endian) — the format is self-delimiting.
    */
  private[graft] def splitBmps(stream: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var off = 0
      def hasNext: Boolean = off + 6 <= stream.length &&
        stream(off) == 'B'.toByte && stream(off + 1) == 'M'.toByte
      def next(): Array[Byte] = {
        val size = (stream(off + 2) & 0xff) | ((stream(off + 3) & 0xff) << 8) |
          ((stream(off + 4) & 0xff) << 16) | ((stream(off + 5) & 0xff) << 24)
        if (size < 54 || off + size > stream.length)
          throw new IllegalArgumentException(
            s"malformed BMP stream: frame at $off declares $size of ${stream.length - off} bytes")
        val frame = java.util.Arrays.copyOfRange(stream, off, off + size)
        off += size
        frame
      }
    }

  /** BGR triplets → 8-bit luma (BT.601 integer weights) — the same gray
    * convention the in-repo decode path uses.
    */
  private def toGray(img: Codecs.Image): Jpeg.Gray = {
    val px = new Array[Byte](img.width * img.height)
    var i = 0
    while (i < px.length) {
      val b = img.pixels(3 * i) & 0xff
      val g = img.pixels(3 * i + 1) & 0xff
      val r = img.pixels(3 * i + 2) & 0xff
      px(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
      i += 1
    }
    Jpeg.Gray(img.width, img.height, px)
  }
}
