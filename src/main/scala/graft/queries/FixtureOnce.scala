package graft.queries

import org.apache.spark.sql.SparkSession

/** Build-once parquet scaffold shared by every synthetic fixture corpus
  * (Uni/Html/Unseg/Gopher/Pii/Url): ONE copy of the JVM-local built
  * flag + lock + overwrite-parquet write, so the build-once race and
  * the write pattern are fixed in one place instead of six. Content
  * generation stays with each fixture object — the DuckDB oracles
  * replay those exact strings, so the rows argument must remain
  * byte-identical under refactoring (the oracle gate proves it).
  *
  * `rows` is by-name: generation runs only on the first call per JVM.
  */
private[queries] final class FixtureOnce(val root: String, parts: Int = 2) {
  @volatile private var built = false

  def ensure(s: SparkSession)(rows: => Seq[(Long, String)],
                              idCol: String, valCol: String): String =
    synchronized {
      if (!built) {
        import s.implicits._
        rows.toDF(idCol, valCol).coalesce(parts)
          .write.mode("overwrite").parquet(root)
        built = true
      }
      root
    }

  /** Three-column variant (id + two string columns) for fixtures that
    * carry a grouping attribute alongside the text (CurationFixture's
    * lang column). Same build-once flag and write pattern.
    */
  def ensure3(s: SparkSession)(rows: => Seq[(Long, String, String)],
              idCol: String, c2: String, c3: String): String =
    synchronized {
      if (!built) {
        import s.implicits._
        rows.toDF(idCol, c2, c3).coalesce(parts)
          .write.mode("overwrite").parquet(root)
        built = true
      }
      root
    }
}
