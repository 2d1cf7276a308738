package graft

import graft.pipeline.{TrendsJob, TrendsPipeline}
import java.nio.file.Files
import java.time.LocalDate

/** End-to-end IT for the schedulable job artifact: file-drop input →
  * pipeline → sink, default-or-override week contract, idempotent
  * overwrite vs bit-parity append.
  */
class TrendsJobSpec extends SparkSpec {
  import spark.implicits._

  private def wide = Seq(
    ("Atlantis", 10L, 40L, 40L, 5L, 0L),
    ("Flatland", 3L, 3L, 3L, 3L, 3L),
  ).toDF("country", "vpn", "hack", "cyber", "security", "wifi")

  test("week contract: explicit args are a backfill, none means previous week") {
    val explicit = TrendsJob.Config(weekStart = Some("2024-01-01"), weekEnd = Some("2024-01-07"))
    assert(TrendsJob.resolveWeek(explicit, LocalDate.parse("2025-06-15")) ===
      ("2024-01-01", "2024-01-07"))
    // a Wednesday: previous Mon-Sun week
    assert(TrendsJob.resolveWeek(TrendsJob.Config(), LocalDate.parse("2024-01-17")) ===
      ("2024-01-08", "2024-01-14"))
    // Monday edge: the immediately preceding week, not two weeks back
    assert(TrendsJob.resolveWeek(TrendsJob.Config(), LocalDate.parse("2024-01-15")) ===
      ("2024-01-08", "2024-01-14"))
  }

  test("arg parsing validates mode, week pairing, and required paths") {
    val cfg = TrendsJob.parse(Array(
      "--input", "/in.parquet", "--out", "/out",
      "--week-start", "2024-01-01", "--week-end", "2024-01-07",
      "--terms", "a,b", "--mode", "append"))
    assert(cfg.terms === Seq("a", "b") && cfg.mode === "append")
    intercept[IllegalArgumentException](TrendsJob.parse(Array("--out", "/out")))
    intercept[IllegalArgumentException](TrendsJob.parse(Array(
      "--input", "/i", "--out", "/o", "--mode", "upsert")))
    intercept[IllegalArgumentException](TrendsJob.parse(Array(
      "--input", "/i", "--out", "/o", "--week-start", "2024-01-01")))
    intercept[IllegalArgumentException](TrendsJob.parse(Array("--frobnicate")))
  }

  test("end-to-end: file drop in, golden week out, idempotent re-run, append duplicates") {
    val dir = Files.createTempDirectory("graft-job").toString
    val in = s"$dir/wide.parquet"
    wide.write.parquet(in)
    val out = s"$dir/table"
    val cfg = TrendsJob.Config(input = in, out = out,
      weekStart = Some("2024-01-01"), weekEnd = Some("2024-01-07"))

    TrendsJob.execute(spark, cfg)
    val first = spark.read.parquet(out)
      .orderBy("country", "ranking")
      .select("country", "week_start", "week_end", "search_term", "interest", "ranking")
      .as[(String, String, String, String, Long, Int)].collect().toSeq
    assert(first === Seq(
      ("Atlantis", "2024-01-01", "2024-01-07", "cyber", 40L, 1),
      ("Atlantis", "2024-01-01", "2024-01-07", "hack", 40L, 2),
      ("Atlantis", "2024-01-01", "2024-01-07", "vpn", 10L, 3),
      ("Atlantis", "2024-01-01", "2024-01-07", "security", 5L, 4),
      ("Atlantis", "2024-01-01", "2024-01-07", "wifi", 0L, 5)))

    // overwrite mode: re-running the same week replaces it (no duplicates)
    TrendsJob.execute(spark, cfg)
    assert(spark.read.parquet(out).count() === 5)

    // a second week lands beside the first; re-running week 1 touches only week 1
    TrendsJob.execute(spark, cfg.copy(
      weekStart = Some("2024-01-08"), weekEnd = Some("2024-01-14")))
    assert(spark.read.parquet(out).count() === 10)
    TrendsJob.execute(spark, cfg)
    assert(spark.read.parquet(out).count() === 10)

    // append mode: the reference's bit-parity WRITE_APPEND duplicates re-runs
    val appendOut = s"$dir/append_table"
    val acfg = cfg.copy(out = appendOut, mode = "append")
    TrendsJob.execute(spark, acfg)
    TrendsJob.execute(spark, acfg)
    assert(spark.read.parquet(appendOut).count() === 10)
  }

  test("fetcher plugs in front of the file drop (EP1 shape)") {
    val fetcher = new graft.sources.TrendsSource.Fetcher {
      def fetch(terms: Seq[String], ws: String, we: String) = Seq(
        graft.sources.TrendsSource.Interest("Atlantis", Seq(10L, 40L, 40L, 5L, 0L)))
    }
    val dir = Files.createTempDirectory("graft-job-f").toString
    val cfg = TrendsJob.Config(input = "unused", out = s"$dir/t")
    val (ws, we) = TrendsJob.execute(spark, cfg, fetcher = Some(fetcher),
      today = LocalDate.parse("2024-01-17"))
    assert((ws, we) === ("2024-01-08", "2024-01-14"))
    val got = spark.read.parquet(s"$dir/t")
    assert(got.count() === 5)
    assert(got.select("week_start").distinct().as[String].collect().toSeq === Seq(ws))
  }
}
