package graft

import graft.operators.{Dedup, DedupState}
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Epoch-advance equivalence: `DedupState.merge(state, batch)` must land on
  * exactly the state `DedupState.write(corpus ∪ batch)` would build — rows,
  * not just query answers — on all four standing tables. This is the pin
  * that makes the rolling-ingest story complete: the incremental probe
  * queries were already verified against recomputation, but until this
  * spec nothing proved the state TRANSITION itself loses nothing, and a
  * 100 TB deployment runs `state := state ⊕ batch` every epoch with no
  * full rebuild to compare against.
  */
class DedupStateMergeSpec extends SparkSpec {

  private val dir = sf()

  private def docs = Tables.documents(spark, dir)

  private def sameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what diverged between merged and rebuilt state")
  }

  test("merge(state, batch) ≡ write(corpus ∪ batch) on all four tables") {
    val split = docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
    val nM = DedupState.names("graft_mergespec_m", dir)
    val nF = DedupState.names("graft_mergespec_f", dir)
    DedupQueries.buildFullState(spark, docs.filter(col("doc_id") < split), nM)
    DedupQueries.mergeEpoch(spark, docs.filter(col("doc_id") >= split), nM)
    DedupQueries.buildFullState(spark, docs, nF)
    sameRows(DedupState.bands(spark, nM), DedupState.bands(spark, nF), "band table")
    sameRows(DedupState.toks(spark, nM), DedupState.toks(spark, nF), "token table")
    sameRows(DedupState.spans(spark, nM), DedupState.spans(spark, nF), "span table")
    sameRows(DedupState.comps(spark, nM), DedupState.comps(spark, nF), "comps table")

    // the stored-probe queries must be green against the MERGED state: the
    // full-corpus cluster query read off it matches the from-scratch
    // clusters query (same shape clustersStored pins against graft_all)
    val storedClusters = Dedup.connectedComponents(
      DedupQueries.stateVerifiedEdges(spark, nM), docs.select("doc_id"), "doc_id")
      .withColumn("keeper", col("doc_id") === col("comp"))
    val recomputed = DedupQueries.clusters(spark, dir)
    sameRows(storedClusters, recomputed.select("doc_id", "comp", "keeper"),
      "clusters probed off the merged state")
  }

  test("a second epoch advances the same state again (merge is repeatable)") {
    // three epochs: corpus thirds 0..t1, t1..t2, t2..end — merge twice,
    // rebuild once, compare. Pins that an APPENDED state (multiple files
    // per bucket) is itself a valid merge base, not just a fresh write.
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (mx / 3, mx * 2 / 3)
    val nM = DedupState.names("graft_mergespec_m2", dir)
    val nF = DedupState.names("graft_mergespec_f2", dir)
    DedupQueries.buildFullState(spark, docs.filter(col("doc_id") < t1), nM)
    DedupQueries.mergeEpoch(spark,
      docs.filter(col("doc_id") >= t1 && col("doc_id") < t2), nM)
    DedupQueries.mergeEpoch(spark, docs.filter(col("doc_id") >= t2), nM)
    DedupQueries.buildFullState(spark, docs, nF)
    sameRows(DedupState.bands(spark, nM), DedupState.bands(spark, nF), "band table")
    sameRows(DedupState.toks(spark, nM), DedupState.toks(spark, nF), "token table")
    sameRows(DedupState.spans(spark, nM), DedupState.spans(spark, nF), "span table")
    sameRows(DedupState.comps(spark, nM), DedupState.comps(spark, nF), "comps table")
  }
}
