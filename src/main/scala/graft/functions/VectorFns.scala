package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns.
  *
  * Pure Catalyst higher-order functions (`zip_with` + `aggregate`) — no
  * UDFs, fully codegen'd, no shuffle. Arithmetic is promoted to double
  * before accumulation (float accumulation loses ~1e-3 at dim 1000+).
  */
object VectorFns {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SRP/SimHash) signature of a vector: `bits`-bit
    * LongType signature. Hyperplanes are pseudo-random but fully
    * deterministic: plane i's component j is derived from xxhash64(i, j),
    * mapped to ±1. Sign of <v, plane_i> sets bit i.
    *
    * This keeps ANN bucketing reproducible across runs/engines without
    * shipping a random-state file — at 100 TB the signature is computed
    * scan-side in one pass, and candidate generation is a groupBy on the
    * signature (or banded substrings of it), not an O(n²) join.
    */
  def srpSignature(v: Column, bits: Int): Column = srpSignatureOffset(v, bits, 0)

  /** As srpSignature, with hyperplane indices shifted by `offset` so
    * multiple independent bands can be derived from one plane family.
    */
  def srpSignatureOffset(v: Column, bits: Int, offset: Int): Column = {
    require(bits <= 63, "signature must fit a long")
    val dv = asDouble(v)
    val bitCols = (0 until bits).map { i =>
      // projection_i = sum_j v[j] * sign(xxhash64(offset+i, j))
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1), (x, j) =>
          x * when(xxhash64(lit(offset + i), j) % 2 === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
