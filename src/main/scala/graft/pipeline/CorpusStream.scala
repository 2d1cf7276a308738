package graft.pipeline

import graft.functions.Bloom
import graft.operators.{Dedup, DedupState, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of [[CorpusJob]] — the curation funnel as a rolling
  * `foreachBatch` ingest against persisted dedup state. Each micro-batch
  * epoch:
  *
  *  1. advances the HEAD state with batch-sized work only — new text/bow
  *     hashes are appended (never rescanned: with the epoch contract that
  *     batch ids exceed all standing ids, an established min-id keeper can
  *     never be unseated), batch simhash fingerprints are appended, and
  *     Hamming≤3 edges form from batch-self pairs plus a batch×standing
  *     banded probe ([[Dedup.hammingCrossPairs]]) — the standing side is
  *     never re-paired. Component assignments advance through the
  *     contraction transition ([[DedupState.mergedComps]]) proven
  *     equivalent to a from-scratch CC;
  *  2. republishes the curated corpus snapshot by re-running the release
  *     tail ([[CorpusJob.curateTail]] — the IDENTICAL code path the batch
  *     job runs) over the standing survivor relation.
  *
  * Why republish instead of appending curated docs: curation is not
  * append-monotone — a later epoch can merge two near-dup clusters
  * (dropping a previously published keeper) or deliver an eval doc whose
  * twin was already published (decontamination retracts it). An
  * append-only sink would have to emit retractions; a snapshot republish
  * over the survivor relation — already shrunk by the incremental dedup
  * head, and re-derived per release exactly as a production corpus release
  * re-derives its mixing/packing — is the honest semantics. That makes
  * the equivalence pin exact: after N epochs the published corpus is
  * row-identical to one batch [[CorpusJob.execute]] over the union
  * (StatefulStreamingSpec).
  *
  * State lives in five catalog tables per stream (hash keepers, bow
  * keepers, survivor rows, simhash fingerprints, component assignments,
  * eval blocklist) — the same parquet-backed shape as
  * [[graft.operators.DedupState]].
  */
object CorpusStream {

  /** Catalog table names for one stream's standing state. */
  final case class StateNames(hashes: String, bows: String, raw: String,
                              sims: String, comps: String, block: String)

  def names(prefix: String): StateNames =
    StateNames(s"${prefix}_hashes", s"${prefix}_bows", s"${prefix}_raw",
               s"${prefix}_sims", s"${prefix}_comps", s"${prefix}_block")

  /** Drop all state tables (test hygiene / stream reset). */
  def reset(s: SparkSession, n: StateNames): Unit =
    Seq(n.hashes, n.bows, n.raw, n.sims, n.comps, n.block)
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))

  private def appendTable(df: DataFrame, table: String): Unit =
    df.write.mode("append").format("parquet").saveAsTable(table)

  private def tableOr(s: SparkSession, table: String,
                      empty: => DataFrame): DataFrame =
    if (s.catalog.tableExists(table)) s.table(table) else empty

  /** Advance the head state with one micro-batch. Epoch contract: every
    * `doc_id` in `batch` exceeds every id already in the state (the
    * ingest-order invariant all incremental dedup state here relies on —
    * it is what makes min-id keepers append-only).
    */
  def ingest(s: SparkSession, batch: DataFrame, n: StateNames): Unit = {
    val b = batch.localCheckpoint(true)
    // 1. exact dedup head: one row per NEW text hash, keeper = batch min
    val bh = b.select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
    val newHashes = bh.join(
        tableOr(s, n.hashes, bh.limit(0)).select("h"), Seq("h"), "left_anti")
      .localCheckpoint(true)
    appendTable(newHashes, n.hashes)
    val exactKeep = b.join(newHashes.select("doc_id"), Seq("doc_id"), "left_semi")
    // 1b. bag-of-words head over the exact keepers
    val bbh = exactKeep.select(col("doc_id"),
        md5(concat_ws(" ", sort_array(TextAnalysis.tokens(col("text"))))).as("bh"))
      .groupBy("bh").agg(min("doc_id").as("doc_id"))
    val newBows = bbh.join(
        tableOr(s, n.bows, bbh.limit(0)).select("bh"), Seq("bh"), "left_anti")
      .localCheckpoint(true)
    appendTable(newBows, n.bows)
    val bowKeep = exactKeep
      .join(newBows.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    appendTable(bowKeep, n.raw)
    // 2. near-dup head: batch fingerprints + edges vs (standing ∪ batch),
    // assignments advanced through the proven contraction transition
    val sim = Dedup.simhash(bowKeep, "doc_id", "text").localCheckpoint(true)
    val standingSims = tableOr(s, n.sims, sim.limit(0))
    val selfEdges = Dedup.hammingPairs(sim, "doc_id", "simhash",
      bits = 60, nBands = 4, maxHamming = 3).select("a", "b")
    val crossEdges = Dedup.hammingCrossPairs(sim, standingSims, "doc_id",
      "simhash", bits = 60, nBands = 4, maxHamming = 3).select("a", "b")
    val standingComps = tableOr(s, n.comps,
      sim.select(col("doc_id"), col("doc_id").as("comp")).limit(0))
    val updated = DedupState.mergedComps(s, "doc_id", bowKeep.select("doc_id"),
      selfEdges.unionByName(crossEdges), standingComps)
    appendTable(sim, n.sims)
    updated.write.mode("overwrite").format("parquet").saveAsTable(n.comps)
    // 3. decontamination blocklist: eval docs hash their ORIGINAL text
    appendTable(b.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h")), n.block)
  }

  /** Republish the curated corpus snapshot from the standing state: derive
    * the decontaminated near-dup-free survivor set relationally (no text
    * re-hashing — the head already did that work), then run the shared
    * release tail. Returns what [[CorpusJob.execute]] returns.
    */
  def publish(s: SparkSession, n: StateNames, cfg: CorpusJob.Config,
              snapshotRoot: Option[String] = None): (DataFrame, CorpusJob.TailCounts) = {
    Bloom.register(s) // no-op when GraftExtensions installed them already
    val raw = s.table(n.raw)
    val keepers = s.table(n.comps)
      .filter(col("doc_id") === col("comp")).select("doc_id")
    val near = raw.join(keepers, Seq("doc_id"), "left_semi")
    val clean0 = Bloom.decontaminate(
      near.filter(col("doc_id") % 10 =!= 0), md5(col("text")),
      s.table(n.block))
    val res = CorpusJob.curateTail(s, clean0, raw.count(), cfg)
    // optional versioned release: every epoch's snapshot goes through the
    // transactional SnapshotStore swap too — readers follow `_CURRENT` and
    // can never observe a half-written corpus, each epoch is a time-travel
    // version, and `vacuum` bounds retention. cfg.out stays the plain
    // latest-snapshot path either way (the batch-twin equivalence surface).
    snapshotRoot.foreach(root => graft.sinks.SnapshotStore.publish(res._1, root))
    res
  }

  /** Attach the rolling ingest to a streaming documents source: every
    * micro-batch advances the head state and republishes the snapshot.
    */
  def run(source: DataFrame, cfg: CorpusJob.Config, n: StateNames,
          snapshotRoot: Option[String] = None): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        ingest(s, batch, n)
        publish(s, n, cfg, snapshotRoot)
        ()
      }
      .start()

  /** spark-submit entry — the rolling-ingest sibling of [[CorpusJob.main]]:
    * `--input` names a LANDING directory watched as a parquet file stream
    * (each arriving file is a document batch; the ingest contract requires
    * batches to land in ascending doc_id order), `--out` receives the
    * republished curated snapshot after every micro-batch; the remaining
    * flags are [[CorpusJob.parse]]'s. State tables are derived from the
    * output path (same injective naming rule as DedupState.names).
    */
  def main(args: Array[String]): Unit = {
    val cfg = CorpusJob.parse(args)
    val b0 = SparkSession.builder().appName("graft-corpus-stream")
    val b = sys.env.get("SPARK_GRAFT_MASTER").fold(b0)(b0.master)
    val spark = graft.Sessions.withGraftConf(b).getOrCreate()
    val sfx = cfg.out.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(cfg.out.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val source = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .parquet(cfg.input)
    run(source, cfg, names(s"corpus_stream_${sfx}_$tag")).awaitTermination()
  }
}
