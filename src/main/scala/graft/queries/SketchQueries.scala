package graft.queries

import graft.Tables
import graft.functions.{Bloom, Cms}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-prefilter query patterns. HLL and CMS are approximate and therefore
  * engine-tested (HllSpec/CmsSpec), but a Bloom PREFILTER composes into
  * EXACT queries: Bloom has no false negatives, so following the probe with
  * the exact join keeps results bit-identical to the plain join while the
  * shuffle carries only the (tiny) candidate superset. These two queries are
  * the canonical 100 TB shapes:
  *
  *  - join pruning: filter a big fact scan by a broadcast filter built from
  *    the qualifying keys of a selective dim predicate BEFORE the exact
  *    semi-join — the exchange shrinks from |fact| to |candidates|;
  *  - decontamination: an anti-join split where rows the filter rejects are
  *    provably clean (no false negatives!) and skip the join entirely; only
  *    "maybe" rows — blocklist hits plus the configured false-positive
  *    rate — pay for the exact anti-join.
  *
  * The oracle states the same queries as plain semi/anti joins: any
  * false-negative in the filter or slip in the split logic breaks the hash
  * match.
  */
object SketchQueries {

  /** Revenue of lineitems belonging to URGENT orders. The bloom prefilter
    * runs BEFORE the exact semi-join: one 128 KiB filter over the
    * qualifying orderkeys, carried to the fact scan as a task-closure
    * Literal (see [[graft.functions.Bloom.prefilter]]). At 100 TB the
    * semi-join's shuffle then carries only rows that can match (plus the
    * ~1% false-positive tail the exact join removes) instead of the whole
    * fact table.
    */
  def bloomSemiRevenue(s: SparkSession, d: String): DataFrame = {
    Bloom.register(s)
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val pruned = Bloom.prefilter(
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"),
      col("l_orderkey"), urgent)
    pruned
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Decontamination: drop train documents (doc_id % 10 <> 0) whose exact
    * text hash appears in the eval blocklist (doc_id % 10 = 0), reported as
    * per-lang survivor stats. The bloom split sends filter-clean rows (the
    * overwhelming majority of a 100 TB corpus) straight to the output with
    * NO join; only probe hits pay for the exact anti-join that removes
    * false positives.
    */
  def bloomDecontam(s: SparkSession, d: String): DataFrame = {
    Bloom.register(s)
    val docs = Tables.documents(s, d)
    val blocklist = docs.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h"))
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("lang"), col("n_chars"), col("text"))
    Bloom.decontaminate(train, md5(col("text")), blocklist)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("lang")
  }

  /** Exact boilerplate-shingle detection with a CMS prefilter — the
    * frequency analog of the bloom patterns above. "Boilerplate" = a
    * 3-gram shingle appearing in >= 5 distinct documents (the C4-style
    * repeated-fragment signal a corpus-curation pipeline strips).
    *
    * Pass 1 builds ONE fixed-size mergeable sketch over the doc-distinct
    * shingle stream (map-side partials, sum-merged — no per-key state
    * anywhere). Pass 2 re-scans and keeps only shingles whose sketch
    * ESTIMATE reaches the threshold BEFORE the exact groupBy: CMS never
    * underestimates, so every true heavy hitter survives the prefilter,
    * and the exact recount + HAVING drops the overestimate tail — the
    * result is bit-identical to the plain groupBy + HAVING the oracle
    * states, while the exchange carries only candidate occurrences. At
    * 100 TB that is the difference between shuffling every shingle
    * occurrence (trillions of rows, mostly singletons) and shuffling the
    * thin candidate slice; width is sized so expected collision noise
    * (N/width per row, min over depth rows) stays below the threshold —
    * scale width with stream size, the sketch stays megabytes.
    */
  def cmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    Cms.register(s)
    val t = 5L
    // cost-based plan choice, MEASURED not guessed (the ANALYZE-style
    // stats pass): one cheap (count, approx-distinct) aggregate gives the
    // mean occurrences per key. When it clears the threshold the key
    // space is heavy-dominated (this fixture's sf0.1/10x corpora: ~95% of
    // occurrence mass is in truly-heavy keys) — no prefilter can prune
    // that, so go STRAIGHT to the exact groupBy and never build a sketch.
    // When keys are mostly rare (Zipf corpora at 100 TB: singletons
    // dominate; sf0.01 here), the sketch prefilter drops non-candidate
    // occurrences map-side and the exchange carries only the thin
    // candidate slice. BOTH paths are exact (CMS has no false negatives;
    // the recount re-verifies), so the choice never changes an output
    // row — only where the shuffle bytes go.
    // ONE materialization serves the stats pass AND whichever plan it
    // picks: the checkpoint sits ABOVE the stats aggregate, so tokenize +
    // shingle runs exactly once per query on both paths (previously the
    // bypass path re-scanned: stats + groupBy = 2 passes where 1.5 would
    // do). The checkpointed stream is doc-distinct shingle OCCURRENCES —
    // the same rows every consumer needs.
    val sh = shingleStream(s, d).localCheckpoint(true)
    val stats = sh
      .agg(count(lit(1)).as("n"),
           approx_count_distinct(col("shingle"), 0.05).as("d")).head()
    val (n, dist) = (stats.getLong(0), math.max(stats.getLong(1), 1L))
    if (n / dist >= t) {
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= t)
        .orderBy(desc("df"), col("shingle"))
    } else {
      // prefilter path: width scales with the stream (collision noise
      // ~n/width per row must stay below t) — memory growth that is
      // inherent to exact heavy hitters at a FIXED absolute threshold; a
      // production pipeline would raise t with scale instead. Correctness
      // never depends on width, only the candidate-slice size does.
      val sk = sh.agg(Cms.sketch(col("shingle"), 4, heavyWidth(n)).as("sk"))
        .head().getAs[Array[Byte]]("sk")
      sh.filter(Cms.query(lit(sk), col("shingle")) >= t)
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= t)
        .orderBy(desc("df"), col("shingle"))
    }
  }

  /** The doc-distinct 3-gram shingle stream cms_heavy_hitters surveys —
    * exposed pre-checkpoint so PlanAuditSpec can pin the scan shape (a
    * checkpointed frame's plan starts at a Scan ExistingRDD).
    */
  private[graft] def shingleStream(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // materialize toks before the shingle HOF (the documented
      // interpreted-lambda re-evaluation pitfall — see dedup_containment)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(Dedup.ngramShingles(col("toks"), 3)).as("shingle"))

  /** Sketch width for a stream of `n` rows: next power of two >= n/4
    * (expected collision noise ~< 1 after the min over depth rows),
    * floored at 2^17 and capped at 2^22 (a 128 MiB sketch at depth 4) —
    * past that cap (n ≈ 16M+ rows) the fixed-t contract should flip to a
    * relative threshold instead of growing the sketch further; see the
    * width discussion in [[cmsHeavyHitters]].
    */
  private[graft] def heavyWidth(n: Long): Int = {
    val target = math.min(math.max(1L << 17, n / 4), 1L << 22).toInt
    java.lang.Integer.highestOneBit(target - 1) << 1
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_semi_revenue" -> (bloomSemiRevenue _),
    "bloom_decontam" -> (bloomDecontam _),
    "cms_heavy_hitters" -> (cmsHeavyHitters _),
  )

  val oracle: Map[String, String] = Map(
    "bloom_semi_revenue" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "bloom_decontam" ->
      """WITH ev AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 = 0)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
        |FROM documents d
        |WHERE d.doc_id % 10 <> 0
        |  AND NOT EXISTS (SELECT 1 FROM ev WHERE ev.h = md5(d.text))
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "cms_heavy_hitters" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 2, 0) + 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
        |  FROM t)
        |SELECT shingle, CAST(count(*) AS BIGINT) AS df
        |FROM g GROUP BY shingle HAVING count(*) >= 5
        |ORDER BY df DESC, shingle""".stripMargin,
  )
}
