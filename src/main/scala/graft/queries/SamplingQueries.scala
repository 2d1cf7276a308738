package graft.queries

import graft.Tables
import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic-sampling extension suite over `documents`: hash-membership
  * Bernoulli and stratified samples, reproduced exactly by the DuckDB
  * oracle (the whole point — a sample that two engines agree on row for
  * row is a sample a re-run agrees on too).
  */
object SamplingQueries {

  /** 10% deterministic sample of documents, keyed on doc_id. */
  def detSample(s: SparkSession, d: String): DataFrame =
    Sampling.deterministic(Tables.documents(s, d), col("doc_id"), 0.10, salt = "s1")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Stratified by lang: uneven per-language fractions (absent lang -> 0). */
  def strataSample(s: SparkSession, d: String): DataFrame =
    Sampling.stratified(Tables.documents(s, d), col("lang"),
        Map("en" -> 0.30, "de" -> 0.10, "fr" -> 0.05),
        col("doc_id"), salt = "s2")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_det" -> (detSample _),
    "sample_strata" -> (strataSample _),
  )

  private def h60(salt: String, key: String): String =
    s"CAST('0x' || substring(md5('$salt:' || CAST($key AS VARCHAR)), 1, 15) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "sample_det" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${h60("s1", "doc_id")} < ${Sampling.threshold(0.10)}
         |ORDER BY doc_id""".stripMargin,
    "sample_strata" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
         |WHERE ${h60("s2", "doc_id")} <
         |  CASE lang WHEN 'en' THEN ${Sampling.threshold(0.30)}
         |            WHEN 'de' THEN ${Sampling.threshold(0.10)}
         |            WHEN 'fr' THEN ${Sampling.threshold(0.05)}
         |            ELSE 0 END
         |GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
