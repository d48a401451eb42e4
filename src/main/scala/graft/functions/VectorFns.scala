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

  /** Codegen'd dot product over array<double> (see ArrayDot). Accepts
    * array<float> too — promoted element-wise first.
    */
  def dot(a: Column, b: Column): Column = ArrayDot(asDouble(a), asDouble(b))

  /** Dot product for inputs ALREADY array<double> (e.g. unitVector
    * output) — the no-conversion hot path for pairwise scoring.
    */
  def dotPre(a: Column, b: Column): Column = ArrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of the vector as array<double>. Materialize this
    * ONCE per row before any pairwise stage: cosine then degrades to a
    * single codegen'd dot per pair instead of three interpreted
    * aggregations (dot + two norms).
    */
  def unitVector(v: Column): Column = {
    val dv = asDouble(v)
    val n = sqrt(ArrayDot(dv, dv))
    transform(dv, x => x / n)
  }

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
  def srpSignature(v: Column, bits: Int, dim: Int): Column =
    srpSignatureOffset(v, bits, 0, dim)

  /** Random-hyperplane (SRP/SimHash) signature: `bits`-bit LongType
    * signature; bit i is the sign of <v, plane_{offset+i}>. Hyperplanes
    * are seeded-deterministic ±1 vectors embedded as literal arrays, so
    * each projection is one codegen'd ArrayDot — reproducible across runs
    * with no random-state file. `offset` shifts the plane family so
    * multiple independent bands can be derived.
    *
    * At 100 TB the signature is computed scan-side in one pass and
    * candidate generation is a groupBy/join on banded signatures, never
    * an O(n²) cross join.
    */
  def srpSignatureOffset(v: Column, bits: Int, offset: Int, dim: Int): Column = {
    require(bits <= 63, "signature must fit a long")
    val dv = asDouble(v)
    val bitCols = (0 until bits).map { i =>
      when(ArrayDot(dv, srpPlane(offset + i, dim)) > 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Deterministic ±1 hyperplane `planeIdx` of dimension `dim`. */
  private def srpPlane(planeIdx: Int, dim: Int): Column = {
    val rnd = new scala.util.Random(0x5EED00000000L + planeIdx)
    typedLit((0 until dim).map(_ => if (rnd.nextBoolean()) 1.0 else -1.0))
  }
}
