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

  private val Splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Deterministic 80/10/10 train/val/test assignment: disjoint, exhaustive
    * hash-range partition; per-split doc counts + char volume.
    */
  def splitSample(s: SparkSession, d: String): DataFrame =
    Sampling.splitAssign(Tables.documents(s, d), col("doc_id"), Splits, salt = "s3")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("split")

  /** Exact-size sample: the 40 smallest-hash docs per language — a fixed
    * per-source budget, identical on every run and engine.
    */
  def topkSample(s: SparkSession, d: String): DataFrame =
    Sampling.topKByHash(Tables.documents(s, d), col("lang"), col("doc_id"),
        k = 40, salt = "s4")
      .select("lang", "doc_id", "n_chars")
      .orderBy("lang", "doc_id")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_det" -> (detSample _),
    "sample_strata" -> (strataSample _),
    "sample_split" -> (splitSample _),
    "sample_topk" -> (topkSample _),
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
    "sample_split" -> {
      val Seq(("train", tTrain), ("val", tVal), _) = Sampling.splitBounds(Splits)
      s"""SELECT CASE WHEN ${h60("s3", "doc_id")} < $tTrain THEN 'train'
         |            WHEN ${h60("s3", "doc_id")} < $tVal THEN 'val'
         |            ELSE 'test' END AS split,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
    },
    "sample_topk" ->
      s"""SELECT lang, doc_id, n_chars FROM (
         |  SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h60("s4", "doc_id")}, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= 40 ORDER BY lang, doc_id""".stripMargin,
  )
}
