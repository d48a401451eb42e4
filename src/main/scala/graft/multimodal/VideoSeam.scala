package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** External-codec video seam: the boundary where MP4/H.264 (and any other
  * codec-dependent format) plugs in.
  *
  * The pure-JVM path covers AVI/MJPEG end to end ([[Avi]] + [[Jpeg]]);
  * real multimodal corpora are MP4/H.264-dominant, and a from-scratch
  * H.264 decoder is explicitly out of scope — that decode belongs to an
  * external library (ffmpeg via javacv, a hardware decoder, an ONNX
  * pipeline). What the ENGINE owns is the seam those libraries snap
  * into, and that seam is what this file defines:
  *
  *   - [[VideoDecoder]]: the narrow interface an external codec
  *     implements — container bytes in, decoded grayscale planes out,
  *     in presentation order. Nothing Spark-specific leaks in, so an
  *     implementation is testable without a session.
  *   - per-PARTITION decoder construction: implementations are handed to
  *     Spark as a `() => VideoDecoder` factory; native codec contexts /
  *     model sessions initialize once per partition, never per row and
  *     never serialized from the driver.
  *   - per-ROW quarantine: at 100 TB some containers WILL be truncated
  *     or corrupt; a bad row becomes an `ok = false` row carrying the
  *     decoder's message (same contract as
  *     `Multimodal.decodeImageFeaturesSafe`), so one poison blob cannot
  *     kill a 1000-executor job and the pipeline routes failures to a
  *     quarantine table with a plain filter.
  *   - [[sniffContainer]]: magic-byte routing (RIFF/AVI vs ISO-BMFF/MP4)
  *     so mixed corpora dispatch each row to the decoder that claims it
  *     without trusting file extensions.
  *
  * [[MjpegAviDecoder]] implements the interface with the in-repo codec —
  * the existence proof that the seam is sufficient for a real container
  * walk + frame decode, and the reference an MP4 implementation mirrors.
  */
object VideoSeam {

  /** The external-decoder contract: demux `container` and decode frames
    * to grayscale planes in presentation order. Implementations must be
    * Serializable only if captured directly — prefer handing Spark a
    * factory (see [[sampleFramesSafe]]) so construction happens on the
    * executor. Throw on malformed input; the caller quarantines.
    */
  trait VideoDecoder {
    def decode(container: Array[Byte]): Iterator[Jpeg.Gray]
  }

  /** Pure-JVM reference implementation: RIFF demux + per-frame JPEG
    * decode. An MP4/H.264 plug-in replaces only this object.
    */
  object MjpegAviDecoder extends VideoDecoder {
    def decode(container: Array[Byte]): Iterator[Jpeg.Gray] =
      Avi.decode(container).frames.iterator.map(Jpeg.decode)
  }

  /** Container sniffing from magic bytes (never from a filename):
    * "avi" for RIFF....AVI , "mp4" for an ISO-BMFF leading `ftyp` box,
    * "unknown" otherwise.
    */
  def sniffContainer(bytes: Array[Byte]): String = {
    def ascii(from: Int, len: Int): String =
      if (bytes.length >= from + len)
        new String(bytes, from, len, "US-ASCII")
      else ""
    if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "AVI ") "avi"
    // ISO-BMFF: 4-byte box size, then the 'ftyp' fourcc
    else if (ascii(4, 4) == "ftyp") "mp4"
    else "unknown"
  }

  case class SafeVideoFrame(doc_id: Long, ok: Boolean, error: String,
                            frame_idx: Int, width: Int, height: Int,
                            sum_pixels: Long)

  /** Quarantining frame sampler over the seam: demux + decode every
    * `stride`-th frame of each row's container with a decoder built ONCE
    * per partition from `mkDecoder`. A row whose container fails to
    * parse (or whose frames fail to decode) yields a single
    * `ok = false` row with the error — never an exception out of the
    * task. Success rows carry per-frame features in frame order.
    */
  def sampleFramesSafe(media: Dataset[Multimodal.MediaRow],
                       mkDecoder: () => VideoDecoder,
                       stride: Int = 2)
                      (implicit spark: SparkSession): Dataset[SafeVideoFrame] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions { rows =>
      // external codec context / native lib init happens HERE, once per
      // partition — the whole point of the factory indirection
      val decoder = mkDecoder()
      rows.flatMap { r =>
        try {
          val out = decoder.decode(r.media).zipWithIndex.collect {
            case (g, idx) if idx % stride == 0 =>
              SafeVideoFrame(r.doc_id, ok = true, error = "", idx,
                g.width, g.height,
                g.pixels.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
          }.toVector
          // materialize INSIDE the try: lazy decoder iterators throw at
          // pull time, which without this would escape the catch
          out
        } catch {
          case scala.util.control.NonFatal(e) =>
            Vector(SafeVideoFrame(r.doc_id, ok = false,
              error = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}",
              frame_idx = -1, width = -1, height = -1, sum_pixels = -1L))
        }
      }
    }
  }
}
