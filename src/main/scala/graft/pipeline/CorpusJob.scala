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
  *  1b. bag-of-words dedup — keep the min-doc_id representative per
  *     sorted-token-multiset hash (reordered-content duplicates);
  *  2. near-dup dedup — 60-bit SimHash, pigeonhole-banded candidate pairs
  *     at Hamming ≤ 3, connected components, keep each cluster's minimum
  *     (the cheapest near-dup pass; MinHash+jaccard is the heavier
  *     second-line tool, available as [[graft.queries.DedupQueries]]);
  *  3. decontamination — drop training docs whose exact text hash appears
  *     in the eval blocklist (doc_id % 10 = 0), bloom-prefiltered so only
  *     probe hits pay the anti-join;
  *  3b. substring-span cut — delete every later copy of a cross-doc
  *     duplicated 8-token span ([[graft.operators.Dedup.spanCut]]): docs
  *     survive, redundant tokens don't;
  *  4. quality screens — minimum token count and distinct-token ratio
  *     (the Gopher-style repetition gate);
  *  4a. corpus-LM screen — unigram avg log-prob fit on the survivors,
  *     corpus-atypical docs below `--min-avg-logp` dropped (the
  *     CCNet-perplexity-filter stand-in);
  *  4b. language-mix sampling — per-language deterministic down-sampling
  *     to the configured target shares (the sample_mix_plan rates);
  *  4c. context-window packing — each doc is assigned its (lang, bin)
  *     2048-token context-window bin (the text_pack_bins rule);
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

  /** `mix` are per-language TARGET corpus shares (the sample_mix_plan
    * contract): language L is down-sampled at rate
    * min(1, share_L · total / n_L); languages absent from the map are
    * dropped. Empty map = no mix stage. `binTokens` is the context-window
    * packing budget.
    */
  final case class Config(
      input: String = "",
      out: String = "",
      minTokens: Int = 10,
      minDistinctRatio: Double = 0.3,
      minAvgLogp: Double = -10.0,
      salt: String = "corpus-v1",
      mix: Map[String, Double] = Map(
        "en" -> 0.50, "de" -> 0.20, "fr" -> 0.15, "es" -> 0.10, "it" -> 0.05),
      binTokens: Long = 2048L,
      spanState: Boolean = false)

  def parse(args: Array[String]): Config = {
    def parseMix(v: String): Map[String, Double] =
      if (v.isEmpty) Map.empty
      else v.split(",").map { kv =>
        // explicit validation: a bare "en" or "en:0.5:x" must surface as
        // the parser's usage-message contract (IllegalArgumentException),
        // not a MatchError/NumberFormatException from the destructure
        kv.split(":") match {
          case Array(k, f) if k.nonEmpty =>
            val share = try f.toDouble catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"--mix entry '$kv': share '$f' is not a number; expected lang:share,...")
            }
            k -> share
          case _ => throw new IllegalArgumentException(
            s"--mix entry '$kv' malformed; expected lang:share,...")
        }
      }.toMap
    def loop(rest: List[String], cfg: Config): Config = rest match {
      case "--input" :: v :: t       => loop(t, cfg.copy(input = v))
      case "--out" :: v :: t         => loop(t, cfg.copy(out = v))
      case "--min-tokens" :: v :: t  => loop(t, cfg.copy(minTokens = v.toInt))
      case "--min-distinct-ratio" :: v :: t =>
        loop(t, cfg.copy(minDistinctRatio = v.toDouble))
      case "--min-avg-logp" :: v :: t =>
        loop(t, cfg.copy(minAvgLogp = v.toDouble))
      case "--salt" :: v :: t        => loop(t, cfg.copy(salt = v))
      case "--mix" :: v :: t         => loop(t, cfg.copy(mix = parseMix(v)))
      case "--bin-tokens" :: v :: t  => loop(t, cfg.copy(binTokens = v.toLong))
      case "--span-state" :: t       => loop(t, cfg.copy(spanState = true))
      case Nil                       => cfg
      case bad :: _ => throw new IllegalArgumentException(
        s"unknown argument '$bad'; expected --input --out " +
          "[--min-tokens n] [--min-distinct-ratio r] [--min-avg-logp x] " +
          "[--salt s] [--mix lang:share,...] [--bin-tokens n] [--span-state]")
    }
    val cfg = loop(args.toList, Config())
    require(cfg.input.nonEmpty && cfg.out.nonEmpty, "--input and --out are required")
    require(cfg.minTokens >= 0 && cfg.minDistinctRatio >= 0.0 && cfg.minDistinctRatio <= 1.0,
      "thresholds out of range")
    require(cfg.mix.values.forall(v => v >= 0.0 && v <= 1.0), "--mix shares out of [0,1]")
    require(cfg.binTokens > 0, "--bin-tokens must be positive")
    cfg
  }

  final case class Funnel(
      input: Long, exactKept: Long, bowKept: Long, nearKept: Long,
      spanCutDocs: Long, cleanKept: Long, screenedKept: Long,
      qualityKept: Long, mixKept: Long, nBins: Long,
      perSplit: Map[String, Long])

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

    // 1b. bag-of-words dedup: min doc_id per sorted-token-multiset hash —
    // catches reordered-content duplicates the text hash misses, still a
    // per-row map + one hash agg (far cheaper than the near-dup machinery
    // it shields)
    val bowKeep = exact
      .select(col("doc_id"),
        md5(concat_ws(" ", sort_array(TextAnalysis.tokens(col("text"))))).as("bh"))
      .groupBy("bh").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val bow = exact.join(bowKeep, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nBow = bow.count()

    // 2. near-dup: simhash Hamming<=3 pairs (the shared Dedup.simhashPairs
    // definition) -> components -> keep each component's minimum doc
    val pairs = Dedup.simhashPairs(bow, "doc_id", "text", maxHamming = 3)
      .select("a", "b")
    val comps = Dedup.connectedComponents(pairs, bow.select("doc_id"), "doc_id")
    val near = bow.join(
        comps.filter(col("doc_id") === col("comp")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nNear = near.count()

    // 3. decontamination vs the eval blocklist (doc_id % 10 = 0), via the
    // shared bloom-split anti-join. Runs BEFORE the span cut: the
    // blocklist hashes ORIGINAL eval text (exact dedup may have removed
    // the eval twin from the frame, so hashes come from the raw input),
    // and only pre-cut text can match those hashes byte-for-byte.
    val blocklist = docs.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h"))
    val clean0 = Bloom.decontaminate(
      near.filter(col("doc_id") % 10 =!= 0), md5(col("text")), blocklist)

    val (out, t) = curateTail(spark, clean0, nInput, cfg)
    (out, Funnel(nInput, nExact, nBow, nNear, t.spanCutDocs, t.cleanKept,
                 t.screenedKept, t.qualityKept, t.mixKept, t.nBins, t.perSplit))
  }

  /** Release-tail counts — the [[Funnel]] fields stages 3b→6 own. */
  final case class TailCounts(
      spanCutDocs: Long, cleanKept: Long, screenedKept: Long,
      qualityKept: Long, mixKept: Long, nBins: Long,
      perSplit: Map[String, Long])

  /** Stages 3b→6 (span cut → screens → LM → mix → packing → split →
    * write), factored out of [[execute]] and shared VERBATIM with the
    * streaming twin ([[CorpusStream]]): the per-release tail is one code
    * path, so "N micro-batch publishes ≡ one batch run" holds for it by
    * construction and the equivalence spec only has to prove the
    * incremental dedup head.
    */
  private[pipeline] def curateTail(spark: SparkSession, clean0: DataFrame,
                                   nInput: Long, cfg: Config): (DataFrame, TailCounts) = {
    // 3b. substring-span cut (the RefinedWeb-style exact-substring pass):
    // delete every later copy of a cross-doc duplicated 8-token span,
    // keeping the first. Document COUNT is unchanged (texts shrink, docs
    // stay) — the funnel reports how many docs lost tokens instead. Runs
    // on the decontaminated corpus, so eval docs never act as a span's
    // kept first occurrence. Zero-token docs fall out of the operator's
    // token stream; the left join + coalesce keeps them with their
    // original text.
    val kept = Dedup.spanCut(clean0, "doc_id", "text", w = 8)
      .select(col("doc_id"), col("n_cut"), col("kept_text"))
    val cutAll = clean0.join(kept, Seq("doc_id"), "left_outer")
      .withColumn("text", coalesce(col("kept_text"), col("text")))
      .drop("kept_text")
      .localCheckpoint(true)
    val nSpanCutDocs = cutAll.filter(col("n_cut") > 0).count()
    val clean = cutAll.drop("n_cut")
    val nClean = clean.count()

    // 4. quality screens on materialized tokens (never inline in a HOF)
    val screened = clean
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= cfg.minTokens)
      .filter(size(array_distinct(col("toks"))).cast("double") >=
        size(col("toks")).cast("double") * cfg.minDistinctRatio)
      .drop("toks")
      .localCheckpoint(true)
    val nScreened = screened.count()
    require(nScreened > 0,
      s"curation emptied the corpus (input=$nInput): relax --min-tokens/--min-distinct-ratio")

    // 4a. corpus-LM screen: unigram avg log-prob estimated on the screened
    // survivors themselves (the standard self-referential fit), docs below
    // the threshold dropped as corpus-atypical — the CCNet-perplexity-
    // filter stand-in. Token-free docs (reachable when --min-tokens 0)
    // have no LM rows at all; they are KEPT via the left join's null
    // branch — the screen judges corpus-typicality, and "no evidence" must
    // not silently count as atypical.
    val quality =
      if (cfg.minAvgLogp == Double.NegativeInfinity) screened
      else {
        val lm = TextAnalysis.unigramLogprob(screened, "doc_id", "text")
          .select("doc_id", "avg_logp")
        screened.join(lm, Seq("doc_id"), "left")
          .filter(col("avg_logp").isNull || col("avg_logp") >= cfg.minAvgLogp)
          .drop("avg_logp").localCheckpoint(true)
      }
    val nQuality = quality.count()
    require(nQuality > 0,
      s"LM screen emptied the corpus (screened=$nScreened): relax --min-avg-logp")

    // 4b. language-mix sampling (the sample_mix_plan contract applied):
    // per-language keep rate = min(1, target_share · total / n_lang),
    // realized as the DETERMINISTIC stratified hash sample so reruns and
    // retries keep the same docs. The per-lang frame is #languages rows —
    // the one collect a mix plan is allowed.
    val mixed =
      if (cfg.mix.isEmpty) quality
      else {
        val rates = quality.groupBy("lang").agg(count(lit(1)).as("n")).collect()
          .map { r =>
            val lang = r.getString(0)
            val share = cfg.mix.getOrElse(lang, 0.0)
            lang -> math.min(1.0, share * nQuality / r.getLong(1).toDouble)
          }.toMap
        Sampling.stratified(quality, col("lang"), rates, col("doc_id"), cfg.salt)
          .localCheckpoint(true)
      }
    val nMixed = mixed.count()
    require(nMixed > 0, "mix sampling emptied the corpus: check --mix shares")

    // 4c. context-window packing (the text_pack_bins contract applied):
    // per-language running token sum, a doc belongs to the bin its FIRST
    // token lands in. The running sum is the TWO-PHASE PrefixSum
    // decomposition over doc_id-range buckets (per-(lang, bucket) local
    // windows + per-lang exclusive bucket offsets) — bit-identical to the
    // serial per-lang window, but the dominant language never funnels
    // through one window task.
    val packed = graft.operators.PrefixSum.runningSumGrouped(
        mixed.withColumn("n_toks",
          size(TextAnalysis.tokens(col("text"))).cast("long")),
        Seq("lang"),
        floor(col("doc_id") / lit(graft.queries.TextQueries.PackBucketDocs)),
        Seq(col("doc_id")), col("n_toks"), "__cum")
      .withColumn("bin", floor((col("__cum") - col("n_toks")) / lit(cfg.binTokens)))
      .drop("n_toks", "__cum")
    val nBins = packed.select("lang", "bin").distinct().count()

    // 5. deterministic split + 6. idempotent write. The overwrite is
    // STATIC (whole path), not dynamic-per-split: a curation is one atomic
    // corpus, and a re-run with stricter screens must not leave a stale
    // split directory from the previous run visible in the output
    val curated = Sampling.splitAssign(packed, col("doc_id"),
      Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01), cfg.salt)
    curated.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("split").parquet(cfg.out)

    val out = spark.read.parquet(cfg.out)
    // --span-state: persist the curated corpus's winnowed span
    // fingerprints as the bucketed standing table the NEXT ingest epoch's
    // incremental span dedup probes ([[graft.queries.DedupQueries
    // .spansIncremental]] / [[graft.operators.DedupState.writeSpans]]) —
    // curation hands the rolling pipeline its dedup state instead of
    // forcing the next batch to re-winnow this corpus
    if (cfg.spanState) {
      import graft.queries.DedupQueries
      graft.operators.DedupState.writeSpans(
        DedupQueries.winnowSelect(out.select("doc_id", "text"),
          DedupQueries.SpanW, DedupQueries.WinnowW),
        graft.operators.DedupState.names("corpus_job", cfg.out), buckets = 16)
    }
    val perSplit = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (out, TailCounts(nSpanCutDocs, nClean, nScreened, nQuality, nMixed,
                     nBins, perSplit))
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
      s""""bow_kept":${f.bowKept},"near_kept":${f.nearKept},""" +
      s""""span_cut_docs":${f.spanCutDocs},"clean_kept":${f.cleanKept},""" +
      s""""screened_kept":${f.screenedKept},"quality_kept":${f.qualityKept},""" +
      s""""mix_kept":${f.mixKept},"n_bins":${f.nBins},"splits":$splits,"out":"${cfg.out}"}""")
  }
}
