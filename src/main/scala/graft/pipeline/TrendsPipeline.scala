package graft.pipeline

import graft.operators.ReferenceOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** The reference's full weekly job (EP1/EP2, SURVEY.md §3) as ONE lazy plan.
  *
  * Input: the wide interest matrix — `country` + one integer column per
  * search term (shape of `pytrend.interest_by_region()`, ref
  * `/root/reference/dags/google_trends_to_bigquery.py:36-38`).
  * Output: the long ranked relation with the sink schema of ref :136-143
  * (`country, week_start, week_end, search_term, interest, ranking`).
  *
  * Semantic parity notes (ref cited; parity target is the *code*, not its
  * comments — SURVEY.md §2a):
  *  - cohort filter (ref :76-85): a country is dropped iff ALL terms share
  *    one identical interest value — value-agnostic, not "all zero" as the
  *    docstring claims;
  *  - tie order (ref :100-106): `sort_priority DESC` means non-vpn terms
  *    beat 'vpn' on interest ties, then alphabetical; `rank(method='first')`
  *    over that order ≡ `row_number()`.
  *
  * The historical backfill DAG (hist :19-26) is the same plan with explicit
  * `(weekStart, weekEnd)` — parameterization, not a second 192-line file.
  */
object TrendsPipeline {

  val DefaultTerms: Seq[String] = Seq("vpn", "hack", "cyber", "security", "wifi")

  /** Previous full Mon–Sun week relative to `today` (ref O18, :19-28).
    * `previousOrSame` so a Monday `today` yields the immediately preceding
    * week (ref: `today - timedelta(days=weekday + 7)`), not two weeks back.
    */
  def previousWeek(today: LocalDate): (String, String) = {
    val monday = today.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY)).minusWeeks(1)
    (monday.toString, monday.plusDays(6).toString)
  }

  /** The full transform chain; `wide` must carry `country` + term columns. */
  def run(wide: DataFrame, weekStart: String, weekEnd: String,
          terms: Seq[String] = DefaultTerms,
          priorityTerm: String = "vpn"): DataFrame = {
    // O4 melt + O5 isin + O6 literals + O7/O8 rename/project (ref :53-64).
    // Melt only the declared term columns: the reference melts the whole
    // frame, but under Spark's ANSI unpivot a stray non-numeric extra column
    // would either fail type coercion or silently stringify `interest`, so
    // extras are excluded up front and the isin stays as the reference's O5
    // guard for parity.
    val long = melt(wide, Seq("country"), terms, "search_term", "interest")
      .filter(col("search_term").isin(terms: _*))
      .withColumn("week_start", lit(weekStart))
      .withColumn("week_end", lit(weekEnd))
      .select("country", "week_start", "week_end", "search_term", "interest")
    // O9–O11 cohort filter (ref :76-85): keep countries having any
    // (country, interest) group with fewer than |terms| distinct terms.
    val kept = cohortFilter(long, Seq("country", "interest"),
                            col("search_term"), terms.size.toLong, "country")
    // O12–O16 ranking (ref :100-110)
    val ranked = kept
      .withColumn("sort_priority", when(col("search_term") === priorityTerm, 0).otherwise(1))
    rankWithin(ranked, Seq("country", "week_start"),
               Seq(desc("interest"), desc("sort_priority"), asc("search_term")))
      .withColumn("ranking", col("ranking").cast("int"))
      .drop("sort_priority")
      .select("country", "week_start", "week_end", "search_term", "interest", "ranking")
  }
}
