package graft

import graft.operators.ReferenceOps._
import graft.pipeline.TrendsPipeline
import org.apache.spark.sql.functions._

/** Unit tests for the reference-parity operators, pinned to the sharp edges
  * found in SURVEY.md §2a:
  *  - cohort filter drops a country iff ALL terms share one value (value-
  *    agnostic — ref :76-85's code, not its "0 interest" docstring);
  *  - `sort_priority DESC` means the priority term LOSES interest ties
  *    (ref :99-106's executed order, not its comment);
  *  - `rank(method='first')` ≡ row_number over the full sort key.
  */
class ReferenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def wide = Seq(
    // all five terms share value 0 -> must be dropped
    ("Nowhere", 0L, 0L, 0L, 0L, 0L),
    // all five share value 7 (non-zero!) -> must also be dropped
    ("Sameland", 7L, 7L, 7L, 7L, 7L),
    // tie between vpn and hack at 50 -> hack (sort_priority 1) outranks vpn
    ("Tieland", 50L, 50L, 10L, 20L, 30L),
    // strictly distinct values -> rankings follow interest desc
    ("Distinctia", 10L, 20L, 30L, 40L, 50L),
  ).toDF("country", "vpn", "hack", "cyber", "security", "wifi")

  private def run() = TrendsPipeline.run(wide, "2024-01-01", "2024-01-07")

  test("melt produces rows x terms") {
    val long = melt(wide, Seq("country"), TrendsPipeline.DefaultTerms, "search_term", "interest")
    assert(long.count() === 4 * 5)
    assert(long.columns.toSeq === Seq("country", "search_term", "interest"))
  }

  test("cohort filter drops all-same-value countries regardless of the value") {
    val countries = run().select("country").distinct().as[String].collect().sorted
    assert(countries.toSeq === Seq("Distinctia", "Tieland"))
  }

  test("priority term loses interest ties (sort_priority DESC)") {
    val tie = run().filter($"country" === "Tieland")
      .orderBy("ranking").select("search_term", "ranking")
      .as[(String, Int)].collect().toSeq
    // hack=50, vpn=50 tie -> hack first; then wifi=30, security=20, cyber=10
    assert(tie === Seq("hack" -> 1, "vpn" -> 2, "wifi" -> 3, "security" -> 4, "cyber" -> 5))
  }

  test("rankings are a permutation of 1..n per country") {
    val ranks = run().groupBy("country")
      .agg(sort_array(collect_list("ranking")).as("r"))
      .select("r").as[Seq[Int]].collect()
    ranks.foreach(r => assert(r === (1 to r.size)))
  }

  test("output schema matches the sink DDL (ref :136-143)") {
    val schema = run().schema
    assert(schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      "country" -> "string", "week_start" -> "string", "week_end" -> "string",
      "search_term" -> "string", "interest" -> "bigint", "ranking" -> "int"))
  }

  test("connectedComponents labels chains, cliques, and isolated nodes") {
    import graft.operators.Dedup
    // graph: chain 1-2-3, pair 10-11, isolated 20
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val got = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("semi-join cohort output is a subset of its input") {
    val df = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L)).toDF("id", "g", "v")
    val out = cohortFilter(df, Seq("g"), col("v"), 2L, "g")
    assert(out.count() <= df.count())
    assert(out.join(df, Seq("id", "g", "v"), "left_anti").count() === 0)
  }

  test("previousWeek derives the prior Mon-Sun window (ref O18)") {
    // 2024-01-10 is a Wednesday -> previous full week is Jan 1-7
    assert(TrendsPipeline.previousWeek(java.time.LocalDate.parse("2024-01-10")) ===
      ("2024-01-01", "2024-01-07"))
    // a Monday must give the immediately preceding week, not two weeks back
    // (ref `today - timedelta(days=weekday + 7)` with weekday = 0)
    assert(TrendsPipeline.previousWeek(java.time.LocalDate.parse("2024-01-08")) ===
      ("2024-01-01", "2024-01-07"))
    // Sunday (weekday 6) -> week ending the day before
    assert(TrendsPipeline.previousWeek(java.time.LocalDate.parse("2024-01-14")) ===
      ("2024-01-01", "2024-01-07"))
  }
}
