package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted partial-aggregate state — incremental materialized-view
  * maintenance for commutative-monoid aggregates (count / sum / min /
  * max, and everything derivable from their partials: avg, rates,
  * ratios). The OLAP sibling of [[DedupState]]: where that keeps dedup
  * probes from re-pairing the corpus, this keeps a standing rollup from
  * re-scanning the fact table.
  *
  * One catalog table per view, holding PARTIAL rows `(key, partial agg
  * columns)`, bucketed + sorted on the grouping key. Rolling-ingest cost
  * profile at 100 TB:
  *
  *  - `write` once per view: the only full fact scan that ever happens.
  *  - `merge` per ingest epoch: aggregate the BATCH to partials and
  *    bucket-aligned-APPEND them — the standing table is never read or
  *    rewritten, and Spark validates the bucket spec so a layout mismatch
  *    fails loudly instead of silently breaking co-partitioning.
  *  - `read` any time: fold the partials with the view's own groupBy.
  *    The table is bucketed on exactly that key, so the fold is
  *    EXCHANGE-FREE (AggStateSpec pins the plan) — epochs of appends cost
  *    one co-located aggregation to serve, not a fact rescan.
  *  - `compact` when partials-per-key grows past taste: fold back to one
  *    partial per key through the staged two-rename swap of
  *    [[Compaction.compactBucketed]]. Reader-equivalent by the monoid
  *    laws (reassociating sums/counts/mins/maxes changes nothing), and
  *    crash-safe: the live table is never dropped before the folded copy
  *    is on disk and hash-verified, so a crash at any point leaves a
  *    readable state that the next compact (or `Compaction.recover`)
  *    heals.
  *
  * Same crash contract as [[DedupState.merge]]: each write is job-atomic
  * but merge is not blindly re-runnable (a replayed append would
  * double-count the batch). Epoch-keyed idempotence or rebuild-on-recover
  * is the driver's job — [[graft.pipeline.CorpusStream]] shows the
  * epoch-partitioned pattern.
  *
  * Only ALGEBRAIC aggregates belong here (partials form a monoid).
  * Holistic ones (exact percentiles, exact distinct) don't decompose —
  * keep those as mergeable sketches ([[graft.functions.Hll]],
  * [[graft.functions.Kmv]]) whose binary values are themselves monoid
  * partials and can ride these same tables.
  */
object AggState {

  final case class Name(parts: String)

  /** Deterministic catalog-safe name, md5-tagged for injectivity (the
    * [[DedupState.names]] rule: sanitizing alone could collapse distinct
    * dirs onto one table and silently share state across corpora).
    */
  def name(prefix: String, dir: String): Name = {
    val sfx = dir.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    Name(s"${prefix}_parts_${sfx}_$tag")
  }

  /** Build the view: persist per-key partials bucketed on the grouping
    * key. Overwrites any previous state under the same name (idempotent).
    */
  def write(partials: DataFrame, key: String, n: Name, buckets: Int): Unit =
    Layout.writeBucketed(partials, key, n.parts, buckets)

  /** Epoch-advance: bucket-aligned APPEND of one batch's partials. The
    * standing table is never read; multiple files per bucket is legal
    * (co-partitioning is guaranteed by the bucket hash, not file count).
    */
  def merge(batchPartials: DataFrame, key: String, n: Name, buckets: Int): Unit =
    batchPartials.write.mode("append").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(n.parts)

  /** The standing partials (bucketed scan on the key). Callers fold with
    * the view's groupBy — exchange-free on the bucket key.
    */
  def read(s: SparkSession, n: Name): DataFrame = s.table(n.parts)

  /** Fold the accumulated partials back to one row per key and swap the
    * folded copy in. `fold` is the view's own partial-combining
    * aggregation; the swap is the staged crash-safe protocol of
    * [[Compaction.compactBucketed]] — the naive overwrite this used to be
    * is a drop-then-recreate that loses the standing view entirely on a
    * mid-write crash.
    */
  def compact(s: SparkSession, n: Name, key: String, buckets: Int)
             (fold: DataFrame => DataFrame): Compaction.Stats =
    Compaction.compactBucketed(s, n.parts, key, buckets, fold)

  /** Whether the view's state table exists in the session catalog. */
  def exists(s: SparkSession, n: Name): Boolean =
    s.catalog.tableExists(n.parts)
}
