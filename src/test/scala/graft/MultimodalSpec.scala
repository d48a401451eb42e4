package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("feature extraction: typed schema, deterministic stub features") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(f => f.n_bytes > 0 && f.content_md5.length == 32))
    assert(feats.forall(f => f.width >= 0 && f.width < 640 && f.height >= 1 && f.height <= 480))
    // deterministic: re-run produces identical features
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(f => (f.doc_id, f.content_md5)).toSet ==
      again.map(f => (f.doc_id, f.content_md5)).toSet)
  }

  test("frame sampling fans out 1->N with stride filtering") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val frames = Multimodal.sampleFramesStub(media, frameBytes = 32, stride = 2)
    val perDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    assert(perDoc.nonEmpty)
    // every kept frame index is even (stride 2)
    assert(frames.collect().forall(_.frame_idx % 2 == 0))
    // fan-out matches byte length: ceil(n/32) frames before stride, every 2nd kept
    val doc0 = Tables.documents(spark, sf).filter($"doc_id" === 0L)
      .select(org.apache.spark.sql.functions.length($"text")).as[Int].head()
    val expected = (0 until (doc0 + 31) / 32).count(_ % 2 == 0)
    assert(perDoc(0L) == expected)
  }

  test("resize stub shrinks media deterministically") {
    val row = Multimodal.MediaRow(1L, Array.tabulate[Byte](1000)(_.toByte))
    val small = Multimodal.resizeStub(row, 64, 64)
    assert(small.media.length < row.media.length)
    assert(small.media.sameElements(Multimodal.resizeStub(row, 64, 64).media))
  }
}
