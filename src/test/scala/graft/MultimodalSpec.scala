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

  test("BMP codec round-trips, including odd widths that need row padding") {
    import graft.multimodal.Codecs
    for (w <- Seq(16, 5, 3, 1); h <- Seq(1, 4, 7)) {
      val img = Codecs.Image(w, h, Array.tabulate[Byte](w * h * 3)(i => (i * 37 + w).toByte))
      val back = Codecs.decodeBmp(Codecs.encodeBmp(img))
      assert(back.width == w && back.height == h, s"${w}x$h dims")
      assert(back.pixels.sameElements(img.pixels), s"${w}x$h pixels (stride=${(w * 3 + 3) / 4 * 4})")
    }
  }

  test("nearest-neighbor resize: corners preserved, dims exact, deterministic") {
    import graft.multimodal.Codecs
    val img = Codecs.Image(8, 8, Array.tabulate[Byte](8 * 8 * 3)(_.toByte))
    val half = Codecs.resizeNearest(img, 4, 4)
    assert(half.width == 4 && half.height == 4)
    // top-left corner pixel maps to source (0,0)
    assert(half.pixels.take(3).sameElements(img.pixels.take(3)))
    // upscale then check the sampled grid is from the source
    val big = Codecs.resizeNearest(img, 16, 16)
    assert(big.width == 16 && big.pixels.take(3).sameElements(img.pixels.take(3)))
  }

  test("PNG codec round-trips; height >= 5 exercises every scanline filter incl. Paeth") {
    import graft.multimodal.Codecs
    for (w <- Seq(16, 5, 3, 1); h <- Seq(1, 5, 7)) {
      // gradient-ish pattern so Sub/Up/Average/Paeth all produce non-trivial deltas
      val img = Codecs.Image(w, h, Array.tabulate[Byte](w * h * 3)(i => (i * 41 + w).toByte))
      val back = Codecs.decodePng(Codecs.encodePng(img))
      assert(back.width == w && back.height == h, s"${w}x$h dims")
      assert(back.pixels.sameElements(img.pixels), s"${w}x$h pixels")
    }
    // the PNG is genuinely compressed for repetitive content
    val flat = Codecs.Image(16, 16, new Array[Byte](16 * 16 * 3))
    assert(Codecs.encodePng(flat).length < 16 * 16 * 3 / 2)
  }

  test("PNG decode: CRC corruption fails loud; ancillary chunks are skipped") {
    import graft.multimodal.Codecs
    import java.nio.ByteBuffer
    val img = Codecs.Image(4, 6, Array.tabulate[Byte](4 * 6 * 3)(i => (i * 7).toByte))
    val png = Codecs.encodePng(img)
    // flip one byte inside the IDAT payload (IHDR chunk ends at offset 33)
    val corrupt = png.clone()
    corrupt(33 + 8 + 2) = (corrupt(33 + 8 + 2) ^ 0x55).toByte
    val err = intercept[IllegalArgumentException](Codecs.decodePng(corrupt))
    assert(err.getMessage.contains("CRC"))
    // splice a valid ancillary tEXt chunk between IHDR and IDAT -> still decodes
    val text = "comment".getBytes("US-ASCII")
    val chunk = ByteBuffer.allocate(12 + text.length)
    chunk.putInt(text.length).put("tEXt".getBytes("US-ASCII")).put(text)
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(text)
    chunk.putInt(crc.getValue.toInt)
    val spliced = png.take(33) ++ chunk.array() ++ png.drop(33)
    val back = Codecs.decodePng(spliced)
    assert(back.pixels.sameElements(img.pixels))
  }

  test("PNG and BMP decode agree on features for the same source image") {
    import graft.multimodal.Codecs
    val img = Codecs.Image(16, 9, Array.tabulate[Byte](16 * 9 * 3)(i => (i * 13 + 5).toByte))
    val viaPng = Codecs.decodePng(Codecs.encodePng(img))
    val viaBmp = Codecs.decodeBmp(Codecs.encodeBmp(img))
    assert(viaPng.pixels.sameElements(viaBmp.pixels))
  }

  test("JPEG decode over the corpus: exact dims, bounded reconstruction drift") {
    val docs = Tables.documents(spark, sf)
    val jpeg = Multimodal.decodeJpegFeatures(Multimodal.jpegFromDocuments(docs)).collect()
    assert(jpeg.length == 500 && jpeg.forall(_.width == 48))
    // GIF is lossless over the SAME 48-wide construction -> exact truth
    val truth = Multimodal.decodeGifFeatures(Multimodal.gifFromDocuments(docs)).collect()
      .map(f => f.doc_id -> f).toMap
    jpeg.foreach { f =>
      val t = truth(f.doc_id)
      assert(f.height == t.height, s"doc ${f.doc_id} height")
      // quantization shifts individual pixels but must preserve mean
      // luminance: allow <= 16/pixel of signed drift on the sum
      assert(math.abs(f.sum_pixels - t.sum_pixels) <= 16L * 48 * f.height,
        s"doc ${f.doc_id} decoded sum drifted: ${f.sum_pixels} vs ${t.sum_pixels}")
    }
  }

  test("video path over the corpus: RIFF demux + per-frame JPEG decode, stride sampling") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.videoFromDocuments(docs, nFrames = 4)
    val frames = Multimodal.sampleVideoFrames(media, stride = 2).collect()
    assert(frames.length == 500 * 2, "4 frames per doc, every 2nd kept")
    assert(frames.forall(f => f.frame_idx % 2 == 0 && f.width == 48 && f.height >= 1))
    assert(frames.forall(_.sum_pixels >= 0))
    // deterministic end to end
    val again = Multimodal.sampleVideoFrames(media, stride = 2).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx)).toSeq ==
      again.sortBy(f => (f.doc_id, f.frame_idx)).toSeq)
  }

  test("corrupt media is quarantined per row — the job completes, bad rows carry the error") {
    import spark.implicits._
    import graft.multimodal.Codecs
    val good = Codecs.encodePng(Codecs.Image(4, 4, Array.tabulate[Byte](48)(_.toByte)))
    val corruptCrc = good.clone(); corruptCrc(40) = (corruptCrc(40) ^ 0x7f).toByte
    val media = Seq(
      Multimodal.MediaRow(1L, good),
      Multimodal.MediaRow(2L, "not a png at all".getBytes),
      Multimodal.MediaRow(3L, corruptCrc),
      Multimodal.MediaRow(4L, good.take(20)), // truncated
      Multimodal.MediaRow(5L, Array.emptyByteArray)).toDS()
    val out = Multimodal.decodeImageFeaturesSafe(media, Codecs.decodePng)
      .collect().sortBy(_.doc_id)
    assert(out.map(_.ok).toSeq == Seq(true, false, false, false, false))
    assert(out.head.sum_pixels == (0 until 48).sum)
    assert(out.filter(!_.ok).forall(_.error.nonEmpty))
    assert(out(2).error.contains("CRC"), s"CRC corruption should say so: ${out(2).error}")
  }

  test("WAV codec round-trips and energy/frame-RMS are exact") {
    import graft.multimodal.Codecs
    val samples = Array.tabulate[Short](2500)(i => ((i % 200 - 100) * 256).toShort)
    val a = Codecs.Audio(16000, samples)
    val back = Codecs.decodeWav(Codecs.encodeWav(a))
    assert(back.sampleRate == 16000 && back.samples.sameElements(samples))
    assert(Codecs.energy(back) == samples.foldLeft(0L)((acc, s) => acc + s.toLong * s))
    val rms = Codecs.frameRms(back, 1024)
    assert(rms.length == 3) // 1024 + 1024 + 452
    assert(rms.forall(r => r >= 0.0 && r <= 32768.0))
  }

  test("real decode paths run distributed over the documents corpus") {
    val docs = Tables.documents(spark, sf)
    val imgFeats = Multimodal.decodeImageFeatures(Multimodal.bmpFromDocuments(docs)).collect()
    assert(imgFeats.length == 500)
    assert(imgFeats.forall(f => f.width == 16 && f.height >= 1 && f.sum_pixels > 0))
    // PNG carries the same image -> decoded features must agree with BMP
    val pngFeats = Multimodal.decodePngFeatures(Multimodal.pngFromDocuments(docs)).collect()
    assert(pngFeats.sortBy(_.doc_id).sameElements(imgFeats.sortBy(_.doc_id)))
    val audio = Multimodal.wavFromDocuments(docs)
    val auFeats = Multimodal.decodeAudioFeatures(audio).collect()
    assert(auFeats.forall(f => f.sample_rate == 16000 && f.n_samples > 0 && f.energy > 0))
    // frame sampling keeps every 2nd frame
    val frames = Multimodal.sampleAudioFrames(audio, frameSize = 64, stride = 2).collect()
    assert(frames.nonEmpty && frames.forall(_.frame_idx % 2 == 0))
  }
}
