package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (pHash): the image-side analog of SimHash.
  *
  * Text dedup (q20–q23) can't see that two images are the same picture
  * re-encoded or slightly perturbed; a DCT perceptual hash can. This is
  * the classic 64-bit pHash construction over this repo's pure-JVM
  * decoded images:
  *
  *   1. grayscale + box-downscale to 32×32 (integer sums, one pass);
  *   2. 2-D DCT-II (separable row/column passes, same structure as the
  *      JPEG codec's — see `Jpeg.fdct`);
  *   3. keep the low-frequency 8×8 corner, drop the DC term;
  *   4. threshold the 63 AC coefficients against their median → 63 bits.
  *
  * Near-duplicate pairs then come from the SAME pigeonhole-banding
  * machinery as text SimHash (`Dedup.simhashPairs`): 4 bands of 16 bits
  * over the 64-bit word guarantee recall 1 for hamming ≤ 3, candidates
  * are verified with an exact `bit_count(xor)`, and the candidate join is
  * a bucketed equality join — never all-pairs. At 100 TB the exchange
  * carries one 8-byte hash per image, not pixels: decode and hash stay
  * in `mapPartitions` next to the binary column, only (id, fp) shuffles.
  */
object Phash {

  /** Box-downscale a decoded RGB image to `n`×`n` grayscale doubles. */
  private def downscale(img: Codecs.Image, n: Int): Array[Double] = {
    val out = new Array[Double](n * n)
    val cnt = new Array[Long](n * n)
    val sum = new Array[Long](n * n)
    var y = 0
    while (y < img.height) {
      val ty = math.min(n - 1, y * n / img.height)
      var x = 0
      while (x < img.width) {
        val tx = math.min(n - 1, x * n / img.width)
        val p = (y * img.width + x) * 3
        val gray = (img.pixels(p) & 0xff) + (img.pixels(p + 1) & 0xff) + (img.pixels(p + 2) & 0xff)
        sum(ty * n + tx) += gray
        cnt(ty * n + tx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < n * n) {
      out(i) = if (cnt(i) == 0) 0.0 else sum(i).toDouble / (3.0 * cnt(i))
      i += 1
    }
    out
  }

  /** Separable 2-D DCT-II of an n×n block, returning the k×k low corner. */
  private def dctLowFreq(block: Array[Double], n: Int, k: Int): Array[Double] = {
    // row pass: only the first k output frequencies are ever used
    val rows = new Array[Double](n * k)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < k) {
        var acc = 0.0
        var x = 0
        while (x < n) {
          acc += block(y * n + x) * math.cos((2 * x + 1) * u * math.Pi / (2.0 * n))
          x += 1
        }
        rows(y * k + u) = acc
        u += 1
      }
      y += 1
    }
    // column pass on the k kept frequencies
    val out = new Array[Double](k * k)
    var u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        var acc = 0.0
        var yy = 0
        while (yy < n) {
          acc += rows(yy * k + u) * math.cos((2 * yy + 1) * v * math.Pi / (2.0 * n))
          yy += 1
        }
        out(v * k + u) = acc
        v += 1
      }
      u += 1
    }
    out
  }

  /** 64-bit perceptual hash (bit 63 unused, 63 AC bits vs their median). */
  def phash(img: Codecs.Image): Long = {
    val low = dctLowFreq(downscale(img, 32), 32, 8)
    val ac = new Array[Double](63)
    var i = 1
    while (i < 64) { ac(i - 1) = low(i); i += 1 }
    val sorted = ac.sorted
    val median = (sorted(30) + sorted(31)) / 2.0
    var fp = 0L
    i = 0
    while (i < 63) { if (ac(i) > median) fp |= (1L << i); i += 1 }
    fp
  }

  /** Per-image fingerprints from BMP-encoded media rows: decode + hash
    * stay partition-local, only (doc, fp) leaves the scan.
    */
  def fingerprints(media: Dataset[Multimodal.MediaRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.doc_id, phash(Codecs.decodeBmp(r.media))))
    }.toDF("doc", "fp")
  }

  /** Near-dup image pairs at hamming ≤ `maxHamming` (≤ 3 for recall 1):
    * 4×16-bit pigeonhole bands over the 64-bit hash, exact verification.
    */
  def nearPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit pigeonhole banding guarantees recall only to hamming 3")
    val bands = (0 until 4).map { k =>
      struct(lit(k).as("band"), shiftright(col("fp"), k * 16).bitwiseAND(0xffffL).as("bv"))
    }
    val banded = fps.select(col("doc"), col("fp"), explode(array(bands: _*)).as("bk"))
      .select(col("doc"), col("fp"), col("bk.band"), col("bk.bv"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
