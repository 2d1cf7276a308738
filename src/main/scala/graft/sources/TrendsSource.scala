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

  /** Driver-side bounded retry (ref `retries=20`), then DataFrame-ify. */
  def fromFetcher(spark: SparkSession, fetcher: Fetcher, terms: Seq[String],
                  weekStart: String, weekEnd: String, retries: Int = 20): DataFrame = {
    var attempt = 0
    var result: Option[Seq[Interest]] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= retries) {
      try result = Some(fetcher.fetch(terms, weekStart, weekEnd))
      catch { case e: Exception => lastErr = e; attempt += 1 }
    }
    val rows = result.getOrElse(throw new RuntimeException(
      s"trends fetch failed after $retries retries", lastErr))
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
