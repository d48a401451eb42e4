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

  test("sniffContainer routes on magic bytes, not extensions") {
    val avi = Avi.encode(Avi.Video(2, 2, 8,
      Seq(Jpeg.encode(Jpeg.Gray(2, 2, Array[Byte](1, 2, 3, 4))))))
    assert(VideoSeam.sniffContainer(avi) == "avi")
    val mp4 = Array[Byte](0, 0, 0, 16) ++ "ftypmp42".getBytes("US-ASCII")
    assert(VideoSeam.sniffContainer(mp4) == "mp4")
    assert(VideoSeam.sniffContainer(Array[Byte](1, 2, 3)) == "unknown")
    assert(VideoSeam.sniffContainer(Array.empty[Byte]) == "unknown")
  }
}
