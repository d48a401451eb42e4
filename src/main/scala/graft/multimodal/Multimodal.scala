package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed by a per-partition batch decoder.
  *
  * The image/audio codec libraries aren't in this container, so the decode
  * step is a clearly-marked deterministic STUB (`decodeStub`): it derives
  * fake width/height/caption features from the bytes (length + md5). The
  * Spark-side plumbing is real and what matters at 100 TB:
  *   - media never leaves `binary` (no base64 blowup, no driver collect);
  *   - decode runs in `mapPartitions` so a real decoder amortizes model /
  *     codec init once per partition (the same batch shape a Pandas UDF
  *     or ONNX session would want);
  *   - output is a typed Dataset with an explicit feature schema.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      content_md5: String,
      width: Int,
      height: Int)

  /** STUB decoder: deterministic fake features from the raw bytes. A real
    * deployment replaces only the body of this function (e.g. javacv /
    * an ONNX vision encoder), keeping the partition-batch shape.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(row.media)
    val hex = digest.map(b => f"$b%02x").mkString
    MediaFeatures(
      doc_id = row.doc_id,
      n_bytes = row.media.length.toLong,
      content_md5 = hex,
      width = (row.media.length % 640).toInt,
      // first md5 byte, unsigned, bounded to a fake pixel dimension
      height = (java.lang.Integer.parseInt(hex.substring(0, 2), 16) % 480) + 1)
  }

  /** Batch feature extraction: one decoder init per partition, streaming
    * over rows. This is the plumbing a real decoder plugs into.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real decoder: init codec/model HERE, once per partition
      rows.map(decodeStub)
    }
  }

  /** Build a media table from the documents table: text bytes stand in for
    * image/audio payloads (same plumbing, available in-container).
    */
  def mediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media")).as[MediaRow]
  }

  /** STUB resize: a real implementation decodes, scales to `w`×`h`, and
    * re-encodes; the stub deterministically samples every k-th byte so the
    * output size tracks the target dimensions. Plumbing (binary in/out,
    * per-partition batching) is real.
    */
  def resizeStub(row: MediaRow, w: Int, h: Int): MediaRow = {
    val target = math.max(1, w * h / 256)
    val step = math.max(1, row.media.length / target)
    MediaRow(row.doc_id, row.media.grouped(step).map(_.head).toArray)
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame-sampler: a real implementation demuxes video and decodes
    * every `stride`-th frame; the stub slices the byte stream into
    * fixed-size fake "frames" and keeps every `stride`-th — producing the
    * 1→N row fan-out shape (flatMap) a real sampler has.
    */
  def sampleFramesStub(media: Dataset[MediaRow], frameBytes: Int = 64,
                       stride: Int = 2)(implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { row =>
      row.media.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, idx) if idx % stride == 0 => Frame(row.doc_id, idx, bytes)
      }
    }
  }
}
