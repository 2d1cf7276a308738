package graft

import graft.operators.{IndexMaintenance, Similarity}
import graft.sinks.SnapshotStore
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** IndexMaintenanceSpec's twin for the PQ tier: codebooks trained on
  * yesterday's distribution keep encoding today's vectors (rolling ingest
  * never errors), but the codewords no longer cover where the data lives —
  * distinct vectors collapse onto near-identical codes, ADC loses all
  * resolution, and measured recall@5 falls through the floor. One
  * maintenance pass retrains the codebooks on the live corpus, re-encodes,
  * republishes through the transactional snapshot swap, and recovers
  * recall; a healthy codebook set is never rewritten.
  */
class PqMaintenanceSpec extends SparkSpec {

  private val Dim = Similarity.PqM * Similarity.PqSub // 64

  /** 16 well-separated cluster centers, distinct within EVERY 8-dim
    * subspace (so a per-subspace retrain can tell them apart).
    */
  private def center(c: Int): Seq[Double] =
    Seq.tabulate(Dim)(j => ((c * 13 + j * 7) % 16) / 4.0)

  /** Live corpus: 6 tight members per cluster, cluster = id % 16 — so the
    * deterministic k-means seeds (the first 16 vec_ids) start one per
    * cluster, and each query's exact top-5 is its 5 co-members.
    */
  private def liveRows: Seq[(Long, Seq[Double])] =
    (0L until 96L).map { i =>
      val c = center((i % 16).toInt)
      (i, c.zipWithIndex.map { case (x, j) =>
        x + 0.001 * (((i * 7 + j * 3) % 11) - 5) })
    }

  /** Yesterday: ONE tight cluster far from today's region — k-means
    * trained here yields 16 near-identical codewords per subspace, so
    * every live vector's ADC distance is the same number and ranking
    * degenerates to vec_id order.
    */
  private def oldRows: Seq[(Long, Seq[Double])] =
    (0L until 96L).map { i =>
      (i, Seq.tabulate(Dim)(j => 100.0 + 0.001 * (((i * 5 + j) % 7) - 3)))
    }

  private def df(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
  }

  private def liveCorpus: DataFrame = df(liveRows)
  private def queries: DataFrame =
    df(liveRows.take(16)).toDF("qid", "qv")

  test("codebook drift breaches the ADC floor; one pass retrains, republishes, recovers") {
    val root = Files.createTempDirectory("graft-pq-maint").toString
    // rolling-ingest state: live vectors ENCODED AGAINST STALE codebooks
    val staleCbs = Similarity.pqCodebooks(df(oldRows))
    SnapshotStore.publish(IndexMaintenance.pqIndexFrom(liveCorpus, staleCbs), root)
    assert(SnapshotStore.currentVersion(root) === Some(0L))

    val floor = 800L
    val r1 = IndexMaintenance.maintainPq(spark, liveCorpus, queries, root,
      floorMilli = floor)
    assert(r1.recallMilli < floor, r1)
    assert(r1.republished && r1.version === Some(1L), r1)
    assert(SnapshotStore.currentVersion(root) === Some(1L))
    assert(r1.recallAfterMilli.exists(_ >= floor), r1)

    // idempotent per state: the second pass measures the NEW codebooks,
    // finds them healthy, rewrites nothing
    val r2 = IndexMaintenance.maintainPq(spark, liveCorpus, queries, root,
      floorMilli = floor)
    assert(!r2.republished && r2.version.isEmpty, r2)
    assert(r2.recallMilli >= floor, r2)
    assert(SnapshotStore.currentVersion(root) === Some(1L))

    // pre-drift version stays readable (rollback / time travel); one
    // frame = codes + codebooks together
    assert(SnapshotStore.readVersion(spark, root, 0L).count() ===
      96L + Similarity.PqM * Similarity.PqK)
  }

  test("healthy codebooks are never republished") {
    val root = Files.createTempDirectory("graft-pq-healthy").toString
    SnapshotStore.publish(IndexMaintenance.buildPqIndex(liveCorpus), root)
    val r = IndexMaintenance.maintainPq(spark, liveCorpus, queries, root,
      floorMilli = 800L)
    assert(!r.republished && r.recallMilli >= 800L, r)
    assert(SnapshotStore.currentVersion(root) === Some(0L))
  }
}
