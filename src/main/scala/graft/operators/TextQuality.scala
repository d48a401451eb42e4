package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Compression-based text quality signals.
  *
  * The deflate compression ratio is the classic redundancy filter for
  * pretraining corpora (boilerplate and machine-generated text compress
  * far below natural prose; extremely high ratios flag random/binary
  * junk). zlib is not expressible in SQL, so this operator is
  * spec-verified (rows-only at the driver gate) rather than
  * oracle-checked.
  *
  * Scale shape: one `Deflater` per PARTITION, reset per row — codec init
  * is amortized exactly like the multimodal decoders, and the operator
  * stays a linear scan with no shuffle.
  */
object TextQuality {

  case class CompressionStats(doc_id: Long, raw_len: Int, comp_len: Int, ratio: Double)

  def compressionStats(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text")(implicit spark: SparkSession): Dataset[CompressionStats] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        // one codec per partition, reused — NOT one per row; native zlib
        // memory is released at task end (not left to GC finalization)
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          // null text → empty payload (ratio 1.0), not a task-killing NPE
          val raw = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compLen = 0
          while (!deflater.finished()) compLen += deflater.deflate(buf)
          val ratio = if (raw.length == 0) 1.0 else compLen.toDouble / raw.length
          CompressionStats(id, raw.length, compLen, ratio)
        }
      }
  }
}
