package graft

import graft.pipeline.TrendsPipeline
import graft.sinks.TableSink
import java.nio.file.Files

/** Golden end-to-end test of the composed pipeline plus the sink's
  * append vs idempotent-overwrite semantics (SURVEY.md §5.4).
  */
class TrendsPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def wide = Seq(
    ("Atlantis", 10L, 40L, 40L, 5L, 0L),
    ("Flatland", 3L, 3L, 3L, 3L, 3L),  // dropped: all terms equal
  ).toDF("country", "vpn", "hack", "cyber", "security", "wifi")

  private val ws = "2024-01-01"
  private val we = "2024-01-07"

  test("golden rows for the composed pipeline") {
    val got = TrendsPipeline.run(wide, ws, we)
      .orderBy("country", "ranking")
      .as[(String, String, String, String, Long, Int)].collect().toSeq
    val expect = Seq(
      // hack/cyber tie at 40: both non-priority -> alphabetical (cyber first);
      // then vpn=10, security=5, wifi=0
      ("Atlantis", ws, we, "cyber", 40L, 1),
      ("Atlantis", ws, we, "hack", 40L, 2),
      ("Atlantis", ws, we, "vpn", 10L, 3),
      ("Atlantis", ws, we, "security", 5L, 4),
      ("Atlantis", ws, we, "wifi", 0L, 5))
    assert(got === expect)
  }

  test("appendTable probes, creates if absent, appends, and enforces schema") {
    val out = TrendsPipeline.run(wide, ws, we)
    spark.sql("DROP TABLE IF EXISTS trends_at")
    TableSink.appendTable(out, "trends_at")        // create-if-absent
    TableSink.appendTable(out, "trends_at")        // ref bit-parity: duplicates
    assert(spark.table("trends_at").count() === 10)
    // schema-enforced append: a frame missing sink columns must be rejected
    val bad = out.drop("ranking")
    intercept[Exception] { TableSink.appendTable(bad, "trends_at") }
    assert(spark.table("trends_at").count() === 10) // failed write landed nothing
    spark.sql("DROP TABLE trends_at")
  }

  test("append sink duplicates on re-run; overwriteWindow is idempotent") {
    val out = TrendsPipeline.run(wide, ws, we)
    val dir = Files.createTempDirectory("graft-sink").toString

    val appendPath = s"$dir/append"
    TableSink.append(out, appendPath, Some("week_start"))
    TableSink.append(out, appendPath, Some("week_start"))
    assert(spark.read.parquet(appendPath).count() === 10) // ref bit-parity: duplicated

    val idemPath = s"$dir/idem"
    TableSink.overwriteWindow(out, idemPath, "week_start")
    TableSink.overwriteWindow(out, idemPath, "week_start")
    assert(spark.read.parquet(idemPath).count() === 5) // re-run replaces the week

    // a different week lands in its own partition, untouched by re-runs
    val other = TrendsPipeline.run(wide, "2024-01-08", "2024-01-14")
    TableSink.overwriteWindow(other, idemPath, "week_start")
    assert(spark.read.parquet(idemPath).count() === 10)
    TableSink.overwriteWindow(out, idemPath, "week_start")
    assert(spark.read.parquet(idemPath).count() === 10)
  }

  test("compactWindow collapses a fragmented partition to one file, rows intact") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/t"
    // accrete a fragmented partition: 6 micro-appends (>=1 file each)
    for (i <- 0 until 6) {
      Seq((i * 2L, "w1"), (i * 2L + 1, "w1")).toDF("v", "win")
        .write.mode("append").partitionBy("win").parquet(path)
    }
    Seq((100L, "w2")).toDF("v", "win")
      .write.mode("append").partitionBy("win").parquet(path)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files(s"$path/win=w1") >= 6)
    val before = spark.read.parquet(path).orderBy("v")
      .collect().map(_.toSeq).toSeq

    TableSink.compactWindow(spark, path, "win", "w1", numFiles = 1)

    assert(files(s"$path/win=w1") === 1, "partition must collapse to one file")
    val after = spark.read.parquet(path).orderBy("v").collect().map(_.toSeq).toSeq
    assert(after === before, "compaction must be row-identical")
    // the untouched partition keeps its files (dynamic overwrite scope)
    assert(spark.read.parquet(path).filter($"win" === "w2").count() === 1)
  }
}
