package graft.queries

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C12 + the text-analysis extension suite over `documents` (SURVEY.md §2c
  * and the training-data-pipeline extensions): token stats, language-ID
  * heuristic, quality scoring, token counting, fingerprinting.
  */
object TextQueries {


  /** C12a — top-20 tokens by frequency (explode + agg + top-k). */
  def c12Tokens(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenRows(Tables.documents(s, d), "doc_id", "text")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(20)

  /** C12b — per-language doc counts + char volume. */
  def c12Lang(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang")

  /** Language-ID heuristic: stopword-occurrence ratio thresholded.
    * Tokens are materialized as a column first so the interpreted lambda
    * doesn't re-split the text per reference.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val ratio = TextAnalysis.stopwordRatioOf(col("toks"))
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        round(ratio, 4).as("en_ratio"),
        when(ratio >= 0.05, "en").otherwise("unk").as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: token counts, avg token length, stopword ratio. */
  def quality(s: SparkSession, d: String): DataFrame = {
    val toks = col("toks")
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        round(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
                / size(toks).cast("double"), 4).as("avg_token_len"),
        round(TextAnalysis.stopwordRatioOf(toks), 4).as("stopword_ratio"),
        col("n_chars"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer. */
  def tokCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws"),
      TextAnalysis.bpeishCount(col("text")).as("n_bpeish"))
      .orderBy("doc_id")

  /** Rolling-hash document fingerprint (order-sensitive). */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c12_tokens" -> (c12Tokens _),
    "c12_lang" -> (c12Lang _),
    "text_langid" -> (langId _),
    "text_quality" -> (quality _),
    "text_tokcount" -> (tokCount _),
    "text_fingerprint" -> (fingerprint _),
  )

  val oracle: Map[String, String] = Map(
    "c12_tokens" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "c12_lang" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents)
        |SELECT doc_id,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE), 4) AS en_ratio,
        |  CASE WHEN CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)
        |            / CAST(len(toks) AS DOUBLE) >= 0.05
        |       THEN 'en' ELSE 'unk' END AS pred_lang
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        |  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE), 4) AS avg_token_len,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio,
        |  n_chars
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_tokcount" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
        |                     t -> CAST('0x' || substring(md5(t), 1, 8) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
