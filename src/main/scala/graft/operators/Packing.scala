package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Best-fit-decreasing context-window packing — the whole-doc packing
  * step a training pipeline runs when documents must NOT be split across
  * context windows (contrast [[graft.queries.TextQueries.packBins]],
  * which concatenates the stream and cuts every `Window` tokens, letting
  * a document straddle — i.e. be truncated at — the window edge).
  *
  * Algorithm: classic BFD (Johnson 1973; ≤ 11/9·OPT + 1 bins) run EXACTLY
  * within each (lang, shard) group, where a shard is a
  * [[graft.queries.TextQueries.PackBucketDocs]]-doc doc_id range — the
  * same decomposition the two-phase running sum uses, and for the same
  * reason: a GLOBAL sequential BFD over one language is a single-task
  * scan of the dominant language of the corpus (the scale-killer shape),
  * while shard-local BFD is one bounded loop per group, massively
  * parallel, with the loop's working state capped at one Long per open
  * bin (≤ shard size). Block-local packing is what production loaders
  * run for exactly this reason; the price is only that a bin never mixes
  * docs from two shards.
  *
  * This is the ONE legitimately imperative operator in the text family —
  * best-fit placement is inherently order-dependent state (each doc's
  * bin depends on every earlier placement), not expressible as windows
  * or aggregates — so it uses the typed `flatMapGroups` escape hatch the
  * way the multimodal byte-codec uses `mapPartitions`: bounded per-group
  * memory, deterministic, with the group sort total-ordered by
  * (n_toks desc, doc_id asc).
  *
  * Determinism contract (the oracle restates it as a recursive CTE):
  *  - docs are placed in (n_toks DESC, doc_id ASC) order;
  *  - best fit = among open bins whose load + n_toks ≤ [[Window]], the
  *    one with the LARGEST load, ties to the lowest bin index;
  *  - no bin fits (including docs longer than the window, which then
  *    overflow their own bin) → open a new bin;
  *  - bin id = shard · shardDocs + local open order — unique only WITHIN
  *    a language (a shard holds ≤ shardDocs docs, so ≤ shardDocs bins,
  *    and shard ranges never collide; but two languages sharing a doc_id
  *    shard reuse the same ids). A bin is therefore keyed by
  *    `(lang, bin)` — as [[packBinsBfd]]'s output schema and the oracle
  *    both do — never by `bin` alone; mix the language into the high bits
  *    if a standalone global id is ever needed.
  */
object Packing {

  /** Context window size in tokens. */
  val Window = 2048L

  /** Docs per BFD shard. Deliberately LARGER than the running-sum cut's
    * 4096-doc prefix-sum bucket: each BFD group runs an O(docs × bins)
    * loop (65536 docs × ~1.6k bins at 50-token docs ≈ 50M long compares,
    * tens of ms per task), and every shard boundary strands up to one
    * underfull bin per (lang, shard) — at 4096 docs that tax is visible
    * against the sequential cut, at 65536 it is ~0.03% of a shard's bins.
    */
  val ShardDocs = 65536L

  // public: the Dataset encoder's generated code constructs/reads these
  final case class Doc(lang: String, shard: Long, doc_id: Long, n_toks: Long)
  final case class Placed(lang: String, doc_id: Long, n_toks: Long, bin: Long)

  /** Pack `docs` (columns `lang`, `doc_id`, `n_toks`) into ≤[[Window]]
    * bins per (lang, doc_id-range shard); returns (lang, doc_id, n_toks,
    * bin). One shuffle (the groupByKey exchange), then a bounded loop per
    * group.
    */
  def bestFitDecreasing(docs: DataFrame, shardDocs: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("lang"),
        floor(col("doc_id") / lit(shardDocs)).cast("long").as("shard"),
        col("doc_id").cast("long"), col("n_toks").cast("long"))
      .as[Doc]
      .groupByKey(d => (d.lang, d.shard))
      .flatMapGroups { (key: (String, Long), it: Iterator[Doc]) =>
        val (lang, shard) = key
        val ds = it.toArray.sortBy(d => (-d.n_toks, d.doc_id))
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = new Array[Placed](ds.length)
        var i = 0
        while (i < ds.length) {
          val d = ds(i)
          // best fit: largest load that still fits, ties to lowest index
          var best = -1
          var bestLoad = -1L
          var j = 0
          while (j < loads.length) {
            val l = loads(j)
            if (l + d.n_toks <= Window && l > bestLoad) { best = j; bestLoad = l }
            j += 1
          }
          val b =
            if (best < 0) { loads += d.n_toks; loads.length - 1 }
            else { loads(best) += d.n_toks; best }
          out(i) = Placed(lang, d.doc_id, d.n_toks, shard * shardDocs + b)
          i += 1
        }
        out
      }
      .toDF()
  }
}
