package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key salting for skewed equi-joins.
  *
  * AQE's skew split (see AqeSkewSpec) handles most skew at runtime, but
  * it only engages on sort-merge joins after a shuffle materializes; the
  * classic static mitigation — when a hot key is KNOWN — is salting:
  * split the fact side's hot key across `salts` sub-keys and replicate
  * the (small) dimension side once per salt, so one key's rows land on
  * `salts` reducers instead of one. Replication multiplies the small
  * side by `salts` — use only when |right| × salts stays broadcast-small
  * or comfortably shuffleable.
  *
  * The salt is derived from a hash of the whole fact row (pure function
  * of the data, deterministic across retries/jobs), not from a random or
  * physical-partition source.
  */
object Salting {

  /** Inner equi-join `left.leftKey == right.rightKey` with the left
    * (large, skewed) side salted `salts` ways and the right (small) side
    * replicated per salt. Result equals the unsalted join exactly.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
