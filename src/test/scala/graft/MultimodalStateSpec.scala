package graft

import graft.multimodal.Multimodal
import graft.operators.{Dedup, Layout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The rolling-media-state contract: bucket-aligned APPEND of one batch's
  * fingerprint bands advances the standing state to exactly the
  * from-scratch rebuild over corpus ∪ batch — so a media ingest epoch
  * decodes and bands ONLY its batch, and the stored probe
  * (`mm_phash_stored`) keeps returning what the full recompute would.
  */
class MultimodalStateSpec extends SparkSpec {

  private def hashes(pred: org.apache.spark.sql.Column): DataFrame =
    Multimodal.ahash(Multimodal.mediaFromText(
        Tables.documents(spark, sf()).filter(pred),
        "doc_id", "text", "image", "documents"), 60)
      .filter(col("n_bytes") > 0)

  test("bucket-aligned band append equals the from-scratch rebuild") {
    val split = 400L
    val merged = "graft_mmstate_spec_merged"
    val full = "graft_mmstate_spec_full"
    Seq(merged, full).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // standing state over the corpus half, then one epoch advance
    Layout.writeBucketed(
      Dedup.hammingLongBands(hashes(col("doc_id") < split),
        "media_id", "ahash", bits = 60, nBands = 4), "band_key", merged, 4)
    graft.queries.MultimodalQueries.mmAdvance(
      spark, merged, hashes(col("doc_id") >= split))
    // from-scratch rebuild over the union
    Layout.writeBucketed(
      Dedup.hammingLongBands(hashes(lit(true)),
        "media_id", "ahash", bits = 60, nBands = 4), "band_key", full, 4)
    val (m, f) = (spark.table(merged), spark.table(full))
    assert(m.count() === f.count())
    assert(m.exceptAll(f).isEmpty && f.exceptAll(m).isEmpty,
      "advanced state diverged from the rebuild")
    // the append preserved the bucket layout (the exchange-free probe
    // contract): a probe against the ADVANCED state returns exactly what
    // the recomputing cross-pair form finds
    val probe = Dedup.hammingCrossPairsLong(
      Dedup.hammingLongBands(hashes(col("doc_id") >= split),
        "media_id", "ahash", bits = 60, nBands = 4)
        .filter(col("media_id") >= split),
      m.filter(col("media_id") < split),
      "media_id", "ahash", bits = 60, nBands = 4, maxHamming = 3)
      .select(col("a"), col("b"), col("hamming"))
    val direct = Dedup.hammingCrossPairs(
      hashes(col("doc_id") >= split), hashes(col("doc_id") < split),
      "media_id", "ahash", bits = 60, nBands = 4, maxHamming = 3)
    assert(probe.exceptAll(direct).isEmpty && direct.exceptAll(probe).isEmpty,
      "stored-state probe diverged from the recomputing cross-pair form")
  }
}
