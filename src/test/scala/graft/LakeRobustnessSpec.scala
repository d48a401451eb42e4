package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operational behaviors a 100 TB lake lives and dies by, pinned as
  * executed facts: schema evolution across write batches, and the two
  * corrupt-file postures (fail loud by default; skip-and-continue when
  * explicitly opted in).
  */
class LakeRobustnessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("schema evolution: mergeSchema unions batch schemas, old rows null the new column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lake").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "extra")
      .write.mode("append").parquet(dir)
    // without mergeSchema Spark picks one footer's schema arbitrarily —
    // the union view must be an explicit opt-in read
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("extra", "id", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("extra"))),
      "pre-evolution rows must read the new column as null")
    assert(rows(2).getInt(rows(2).fieldIndex("extra")) == 30)
  }

  test("corrupt file: default read fails loud; ignoreCorruptFiles skips it and keeps the rest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lake").toString + "/t"
    (1L to 100L).toDF("id").repartition(4).write.parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4)
    // truncate one file mid-body: footer gone -> unreadable
    val victim = files.head
    val raf = new java.io.RandomAccessFile(victim, "rw")
    try raf.setLength(raf.length() / 2) finally raf.close()

    val loud = intercept[Exception](spark.read.parquet(dir).count())
    assert(loud.getMessage != null)

    val prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      // schema supplied explicitly (as a production lake does — the
      // catalog owns it): inference would read every footer up front,
      // where the corrupt file still fails regardless of the skip conf
      val survived = spark.read.schema("id LONG").parquet(dir).count()
      assert(survived > 0 && survived < 100,
        s"expected the 3 intact files' rows only, got $survived")
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
  }
}
