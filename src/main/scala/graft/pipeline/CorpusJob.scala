package graft.pipeline

import graft.Tables
import graft.functions.Bloom
import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the LLM-data sibling of
  * [[TrendsJob]], runnable with
  * `spark-submit --class graft.pipeline.CorpusJob ... --input <sfDir> --out <dir>`.
  *
  * Stage order follows cost: cheap exact/per-row screens first so the
  * expensive near-dup machinery sees the smallest possible corpus.
  *
  *  1. exact dedup — keep the min-doc_id representative per md5(text);
  *  2. near-dup dedup — 60-bit SimHash, pigeonhole-banded candidate pairs
  *     at Hamming ≤ 3, connected components, keep each cluster's minimum
  *     (the cheapest near-dup pass; MinHash+jaccard is the heavier
  *     second-line tool, available as [[graft.queries.DedupQueries]]);
  *  3. decontamination — drop training docs whose exact text hash appears
  *     in the eval blocklist (doc_id % 10 = 0), bloom-prefiltered so only
  *     probe hits pay the anti-join;
  *  4. quality screens — minimum token count and distinct-token ratio
  *     (the Gopher-style repetition gate);
  *  5. deterministic split — disjoint, exhaustive train/val/test hash
  *     ranges, stable across reruns and engines;
  *  6. idempotent write — a STATIC overwrite of the whole output path
  *     partitioned by split: one curation is one atomic corpus, and a
  *     re-run with different screens must not leave stale split
  *     directories behind (dynamic per-partition overwrite would).
  *
  * Every stage count is reported in one JSON line (the funnel a data-lead
  * actually reviews); the returned frame is the curated corpus.
  */
object CorpusJob {

  final case class Config(
      input: String = "",
      out: String = "",
      minTokens: Int = 10,
      minDistinctRatio: Double = 0.3,
      salt: String = "corpus-v1")

  def parse(args: Array[String]): Config = {
    def loop(rest: List[String], cfg: Config): Config = rest match {
      case "--input" :: v :: t       => loop(t, cfg.copy(input = v))
      case "--out" :: v :: t         => loop(t, cfg.copy(out = v))
      case "--min-tokens" :: v :: t  => loop(t, cfg.copy(minTokens = v.toInt))
      case "--min-distinct-ratio" :: v :: t =>
        loop(t, cfg.copy(minDistinctRatio = v.toDouble))
      case "--salt" :: v :: t        => loop(t, cfg.copy(salt = v))
      case Nil                       => cfg
      case bad :: _ => throw new IllegalArgumentException(
        s"unknown argument '$bad'; expected --input --out " +
          "[--min-tokens n] [--min-distinct-ratio r] [--salt s]")
    }
    val cfg = loop(args.toList, Config())
    require(cfg.input.nonEmpty && cfg.out.nonEmpty, "--input and --out are required")
    require(cfg.minTokens >= 0 && cfg.minDistinctRatio >= 0.0 && cfg.minDistinctRatio <= 1.0,
      "thresholds out of range")
    cfg
  }

  final case class Funnel(
      input: Long, exactKept: Long, nearKept: Long, cleanKept: Long,
      qualityKept: Long, perSplit: Map[String, Long])

  /** Run the curation; writes the corpus partitioned by split and returns
    * (curated frame, stage funnel).
    */
  def execute(spark: SparkSession, cfg: Config): (DataFrame, Funnel) = {
    Bloom.register(spark) // no-op when GraftExtensions installed them already
    val docs = Tables.documents(spark, cfg.input)
    val nInput = docs.count()

    // 1. exact dedup: min doc_id per text hash, via a broadcast-friendly
    // self semi-join on (hash, min_id)
    val keepIds = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val exact = docs.join(keepIds, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nExact = exact.count()

    // 2. near-dup: simhash Hamming<=3 pairs (the shared Dedup.simhashPairs
    // definition) -> components -> keep each component's minimum doc
    val pairs = Dedup.simhashPairs(exact, "doc_id", "text", maxHamming = 3)
      .select("a", "b")
    val comps = Dedup.connectedComponents(pairs, exact.select("doc_id"), "doc_id")
    val near = exact.join(
        comps.filter(col("doc_id") === col("comp")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nNear = near.count()

    // 3. decontamination vs the eval blocklist (doc_id % 10 = 0), via the
    // shared bloom-split anti-join
    val blocklist = docs.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h"))
    val clean = Bloom.decontaminate(
      near.filter(col("doc_id") % 10 =!= 0), md5(col("text")), blocklist)
    val nClean = clean.count()

    // 4. quality screens on materialized tokens (never inline in a HOF)
    val quality = clean
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= cfg.minTokens)
      .filter(size(array_distinct(col("toks"))).cast("double") >=
        size(col("toks")).cast("double") * cfg.minDistinctRatio)
      .drop("toks")
    val nQuality = quality.count()

    // 5. deterministic split + 6. idempotent write. The overwrite is
    // STATIC (whole path), not dynamic-per-split: a curation is one atomic
    // corpus, and a re-run with stricter screens must not leave a stale
    // split directory from the previous run visible in the output
    require(nQuality > 0,
      s"curation emptied the corpus (input=$nInput): relax --min-tokens/--min-distinct-ratio")
    val curated = Sampling.splitAssign(quality, col("doc_id"),
      Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01), cfg.salt)
    curated.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("split").parquet(cfg.out)

    val out = spark.read.parquet(cfg.out)
    val perSplit = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (out, Funnel(nInput, nExact, nNear, nClean, nQuality, perSplit))
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    // master comes from spark-submit; SPARK_GRAFT_MASTER enables a local
    // smoke run (e.g. SPARK_GRAFT_MASTER=local[8] sbt "runMain ...")
    val b0 = SparkSession.builder().appName("graft-corpus-job")
    val b = sys.env.get("SPARK_GRAFT_MASTER").fold(b0)(b0.master)
    val spark = graft.Sessions.withGraftConf(b).getOrCreate()
    val (_, f) = execute(spark, cfg)
    val splits = f.perSplit.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"corpus_funnel","input":${f.input},"exact_kept":${f.exactKept},""" +
      s""""near_kept":${f.nearKept},"clean_kept":${f.cleanKept},""" +
      s""""quality_kept":${f.qualityKept},"splits":$splits,"out":"${cfg.out}"}""")
  }
}
