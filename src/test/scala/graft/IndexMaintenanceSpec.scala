package graft

import graft.operators.{IndexMaintenance, Similarity}
import graft.sinks.SnapshotStore
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** The audit→retrain→republish loop on a DRIFTED fixture: an index whose
  * cells were trained on yesterday's distribution keeps serving (rolling
  * ingest assigns drifted vectors to the frozen cells), its measured
  * recall@3 falls through the floor, and ONE maintenance pass retrains on
  * the live corpus, republishes through the transactional snapshot swap,
  * and recovers recall — while a healthy index is never rewritten.
  */
class IndexMaintenanceSpec extends SparkSpec {

  private val Dim = 4

  /** A tight cluster around `center`: member i = center + small
    * deterministic per-coordinate noise (±0.05), so true nearest
    * neighbours are other members of the same cluster.
    */
  private def cluster(center: Seq[Double], ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    ids.map { i =>
      val noise = Seq.tabulate(Dim)(c => 0.01 * (((i * 7 + c * 3) % 11) - 5))
      (i, center.zip(noise).map { case (x, n) => x + n })
    }

  /** A cluster engineered to STRADDLE the stale x=y Voronoi boundary:
    * members spread ALONG the boundary direction (1,1)/√2 — so nearest
    * neighbours are the adjacent members — with a TINY alternating offset
    * along the perpendicular (1,−1)/√2, so consecutive members sit on
    * OPPOSITE sides of the stale cell cut. A query's exact top-3 then
    * always includes other-side members the single-cell probe cannot see.
    */
  private def straddling(center: Seq[Double], ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    ids.zipWithIndex.map { case (i, j) =>
      val along = 0.005 * j
      val side = if (j % 2 == 0) 0.001 else -0.001
      (i, Seq(center(0) + along + side, center(1) + along - side,
              center(2), center(3)))
    }

  private def df(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
  }

  // YESTERDAY's distribution: clusters on the axes — k-means(k=2) trained
  // here puts one centroid near e1 and one near e2, so the Voronoi
  // boundary is the x=y hyperplane.
  private def oldCorpus: DataFrame = df(
    cluster(Seq(1.0, 0.0, 0.0, 0.0), 0L until 20L by 2L) ++
      cluster(Seq(0.0, 1.0, 0.0, 0.0), 1L until 20L by 2L))

  // TODAY's distribution: two tight clusters STRADDLING that boundary
  // ((.7,.7) and (-.7,-.7) both sit on x=y), so the stale cells cut each
  // cluster in half — a query probes one cell and misses the neighbours
  // that landed on the other side. Even ids in cluster 1, odd in cluster
  // 2, so the deterministic seeds (vec_id 0, 1) of a retrain start one
  // per cluster.
  private def liveCorpus: DataFrame = df(
    straddling(Seq(0.7, 0.7, 0.0, 0.0), 0L until 80L by 2L) ++
      straddling(Seq(-0.7, -0.7, 0.0, 0.0), 1L until 80L by 2L))

  private def queries: DataFrame =
    liveCorpus.filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .toDF("qid", "qv")

  test("drift breaches the recall floor; one maintenance pass republishes and recovers") {
    val root = Files.createTempDirectory("graft-ivf-maint").toString
    // the rolling-ingest state: live postings assigned to STALE cells
    val staleCents = Similarity.kmeansFit(oldCorpus, k = 2, rounds = 2, dim = Dim)
    SnapshotStore.publish(
      IndexMaintenance.indexFrom(liveCorpus, staleCents), root)
    assert(SnapshotStore.currentVersion(root) === Some(0L))

    val floor = 800L
    val r1 = IndexMaintenance.maintain(spark, liveCorpus, queries, root,
      floorMilli = floor, k = 2, rounds = 2, dim = Dim)
    // the audit caught the drift...
    assert(r1.recallMilli < floor, r1)
    // ...and exactly one republish recovered it through the swap
    assert(r1.republished && r1.version === Some(1L), r1)
    assert(SnapshotStore.currentVersion(root) === Some(1L))
    assert(r1.recallAfterMilli.exists(_ >= floor), r1)

    // a second pass measures the NEW index, finds it healthy, rewrites
    // nothing — maintenance is idempotent per state
    val r2 = IndexMaintenance.maintain(spark, liveCorpus, queries, root,
      floorMilli = floor, k = 2, rounds = 2, dim = Dim)
    assert(!r2.republished && r2.version.isEmpty, r2)
    assert(r2.recallMilli >= floor, r2)
    assert(SnapshotStore.currentVersion(root) === Some(1L))

    // the pre-drift version remains readable (rollback / time travel)
    assert(SnapshotStore.readVersion(spark, root, 0L).count() ===
      liveCorpus.count() + 2)
  }

  test("a healthy index is never republished") {
    val root = Files.createTempDirectory("graft-ivf-healthy").toString
    SnapshotStore.publish(
      IndexMaintenance.buildIndex(liveCorpus, k = 2, rounds = 2, dim = Dim), root)
    val r = IndexMaintenance.maintain(spark, liveCorpus, queries, root,
      floorMilli = 800L, k = 2, rounds = 2, dim = Dim)
    assert(!r.republished && r.recallMilli >= 800L, r)
    assert(SnapshotStore.currentVersion(root) === Some(0L))
  }
}
