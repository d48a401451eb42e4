package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal AVI (RIFF) container with MJPEG video frames, pure JVM.
  *
  * Motion-JPEG is the classic "video = a JPEG per frame" format: the
  * container contributes demuxing (RIFF chunk walk — the same grammar as
  * WAV), and each frame payload is a baseline JPEG decoded by [[Jpeg]].
  * Together with it, the video path is REAL end to end: container parse →
  * frame extraction → per-frame DCT decode — the shape `sampleFramesStub`
  * only imitated. The container is byte-lossless (frame payloads are
  * stored verbatim), so container round-trips are EXACT even though the
  * frames themselves are lossy JPEG.
  *
  * Structure written: RIFF('AVI ') { LIST(hdrl){ avih, LIST(strl){ strh,
  * strf } }, LIST(movi){ 00dc* } } — the minimal layout every AVI demuxer
  * accepts; no idx1 (players tolerate its absence, and we read
  * sequentially).
  */
object Avi {

  case class Video(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]])

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    if ((payload.length & 1) == 1) buf.put(0.toByte) // RIFF word alignment
    buf.array()
  }

  private def list(kind: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes("US-ASCII") ++ payload)

  def encode(v: Video): Array[Byte] = {
    require(v.frames.nonEmpty, "a video needs at least one frame")
    val maxFrame = v.frames.map(_.length).max
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / math.max(1, v.fps)) // microseconds per frame
      .putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, dwFlags=0 (no idx1 chunk is written, so AVIF_HASINDEX must be off)
      .putInt(v.frames.length).putInt(0)
      .putInt(1).putInt(maxFrame) // one stream, suggested buffer
      .putInt(v.width).putInt(v.height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(math.max(1, v.fps)) // rate = fps/1
      .putInt(0).putInt(v.frames.length)
      .putInt(maxFrame).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(v.width.toShort).putShort(v.height.toShort)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN) // BITMAPINFOHEADER
      .putInt(40).putInt(v.width).putInt(v.height)
      .putShort(1).putShort(24).put("MJPG".getBytes("US-ASCII"))
      .putInt(v.width * v.height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", v.frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  def decode(bytes: Array[Byte]): Video = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 12 && new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not a RIFF/AVI file")
    var width = -1
    var height = -1
    var fps = 1
    val frames = Seq.newBuilder[Array[Byte]]

    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = buf.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size <= end, s"corrupt $id chunk at $pos (size $size)")
        id match {
          case "LIST" =>
            walk(pos + 12, pos + 8 + size) // recurse past the 4-byte list kind
          case "avih" =>
            val usPerFrame = buf.getInt(pos + 8)
            if (usPerFrame > 0) fps = math.max(1, math.round(1000000.0 / usPerFrame).toInt)
            width = buf.getInt(pos + 8 + 32)
            height = buf.getInt(pos + 8 + 36)
          case "00dc" =>
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
          case _ => () // strh/strf/junk/idx1: not needed for demux
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, 8 + buf.getInt(4))
    val fs = frames.result()
    require(width > 0 && height > 0 && fs.nonEmpty, "missing avih header or frames")
    Video(width, height, fps, fs)
  }
}
