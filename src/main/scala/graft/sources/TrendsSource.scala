package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Source adapter for the wide interest matrix (reference O1:
  * `TrendReq(retries=20)` + `build_payload` + `interest_by_region`,
  * `/root/reference/dags/google_trends_to_bigquery.py:36-38`).
  *
  * The fetch itself is an external-API concern, not a query-plan concern:
  * the adapter turns whatever a [[Fetcher]] returns into a DataFrame with
  * the explicit wide schema (never `inferSchema`), and retries happen here
  * on the driver — once data enters the plan it is immutable. A file-drop
  * variant reads the same shape from parquet/csv for replay/backfill.
  */
object TrendsSource {

  /** Wide-matrix schema for a given term list (FIXTURES.md A1). */
  def wideSchema(terms: Seq[String]): StructType =
    StructType(StructField("country", StringType, nullable = false) +:
      terms.map(t => StructField(t, LongType, nullable = false)))

  /** One row of the wide matrix: a country and its per-term interests. */
  final case class Interest(country: String, interests: Seq[Long])

  /** Pluggable fetch boundary (the pytrends call in the reference). */
  trait Fetcher {
    def fetch(terms: Seq[String], weekStart: String, weekEnd: String): Seq[Interest]
  }

  /** Bounded-retry + backoff decorator around any [[Fetcher]] — the live-mode
    * retry budget of the reference's entry point (`TrendReq(retries=20)`,
    * `/root/reference/dags/google_trends_to_bigquery.py:36`; pytrends
    * delegates to urllib3's `Retry(total=retries, backoff_factor=...)`,
    * whose sleep schedule is `backoff_factor * 2^(attempt-1)` seconds).
    *
    * Retries happen on the DRIVER, before any data enters a plan — a fetch
    * is an external-API side effect, and wrapping it in executor-side retry
    * (a task re-run) would re-issue the call once per partition attempt with
    * no budget. Exhaustion throws with the last error as cause, so the
    * scheduler's failure alert carries the real upstream problem.
    *
    * @param inner     the fetcher to decorate
    * @param retries   additional attempts after the first failure (ref: 20)
    * @param backoffFactorMs sleep `backoffFactorMs * 2^(attempt-1)` ms
    *   before retry `attempt` (urllib3 formula); 0 (the pytrends default
    *   the reference runs with) never sleeps
    * @param maxBackoffMs cap on a single sleep (urllib3 DEFAULT_BACKOFF_MAX
    *   analog) so deep retry budgets don't grow sleeps unboundedly
    * @param sleeper   injectable sleep for tests (defaults to Thread.sleep)
    */
  final class RetryingFetcher(inner: Fetcher, retries: Int = 20,
                              backoffFactorMs: Long = 0L,
                              maxBackoffMs: Long = 30000L,
                              sleeper: Long => Unit = Thread.sleep)
      extends Fetcher {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    require(backoffFactorMs >= 0, s"backoffFactorMs must be >= 0, got $backoffFactorMs")

    /** Sleep before retry `attempt` (1-based), in ms: urllib3's
      * `backoff_factor * 2^(attempt-1)`, capped.
      */
    def backoffMs(attempt: Int): Long =
      math.min(backoffFactorMs << math.min(attempt - 1, 30), maxBackoffMs)

    override def fetch(terms: Seq[String], weekStart: String,
                       weekEnd: String): Seq[Interest] = {
      var attempt = 0
      while (true) {
        try return inner.fetch(terms, weekStart, weekEnd)
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt > retries) throw new RuntimeException(
              s"trends fetch failed after $retries retries", e)
            val ms = backoffMs(attempt)
            if (ms > 0) sleeper(ms)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Driver-side bounded retry (ref `retries=20`), then DataFrame-ify.
    * An already-[[RetryingFetcher]] passes through untouched (budgets
    * must not stack); a bare fetcher gets the default no-backoff budget
    * the reference runs with.
    */
  def fromFetcher(spark: SparkSession, fetcher: Fetcher, terms: Seq[String],
                  weekStart: String, weekEnd: String, retries: Int = 20): DataFrame = {
    val retrying = fetcher match {
      case r: RetryingFetcher => r
      case f                  => new RetryingFetcher(f, retries)
    }
    val rows = retrying.fetch(terms, weekStart, weekEnd)
    rows.find(_.interests.length != terms.length).foreach { bad =>
      throw new IllegalArgumentException(
        s"fetcher returned ${bad.interests.length} interests for " +
          s"'${bad.country}' but ${terms.length} terms were requested — " +
          "ragged results would misalign term columns")
    }
    val schema = wideSchema(terms)
    val data = rows.map(r => Row.fromSeq(r.country +: r.interests))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq), schema)
  }

  /** File-drop replay path: read the wide matrix with the explicit schema. */
  def fromParquet(spark: SparkSession, path: String, terms: Seq[String]): DataFrame =
    spark.read.schema(wideSchema(terms)).parquet(path)

  def fromCsv(spark: SparkSession, path: String, terms: Seq[String]): DataFrame =
    spark.read.schema(wideSchema(terms)).option("header", "true").csv(path)
}
