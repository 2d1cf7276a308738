package graft

import graft.operators.{IndexMaintenance, Similarity}
import graft.pipeline.{CorpusJob, CorpusStream}
import graft.sinks.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The ANN-index maintenance loop WIRED INTO the rolling ingest
  * ([[CorpusStream.run]]'s `ann` hook): healthy epochs are no-ops, drift
  * injected mid-stream triggers exactly one transactional republish, and a
  * failure mid-republish leaves the old snapshot live, never blocks
  * document ingest, and is retried at the next scheduled epoch.
  */
class StreamIndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 4

  // the IndexMaintenanceSpec fixture pair: yesterday's axis clusters (the
  // index's training distribution) vs today's straddling clusters (whose
  // nearest neighbours the stale Voronoi cut hides)
  private def cluster(center: Seq[Double], ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    ids.map { i =>
      val noise = Seq.tabulate(Dim)(c => 0.01 * (((i * 7 + c * 3) % 11) - 5))
      (i, center.zip(noise).map { case (x, n) => x + n })
    }
  private def straddling(center: Seq[Double], ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    ids.zipWithIndex.map { case (i, j) =>
      val along = 0.005 * j
      val side = if (j % 2 == 0) 0.001 else -0.001
      (i, Seq(center(0) + along + side, center(1) + along - side,
              center(2), center(3)))
    }
  private def df(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "v")
  private def oldCorpus: DataFrame = df(
    cluster(Seq(1.0, 0.0, 0.0, 0.0), 0L until 20L by 2L) ++
      cluster(Seq(0.0, 1.0, 0.0, 0.0), 1L until 20L by 2L))
  private def liveCorpus: DataFrame = df(
    straddling(Seq(0.7, 0.7, 0.0, 0.0), 0L until 80L by 2L) ++
      straddling(Seq(-0.7, -0.7, 0.0, 0.0), 1L until 80L by 2L))

  private def docEpochs = {
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 240)
      .as[CorpusDoc].collect().sortBy(_.doc_id)
    docs.grouped(80).toSeq
  }

  test("healthy epochs are no-ops; mid-stream drift triggers exactly one republish") {
    val root = Files.createTempDirectory("graft-stream-maint").toString
    val out = Files.createTempDirectory("graft-stream-maint-out").toString
    val n = CorpusStream.names("graft_smaint")
    CorpusStream.reset(spark, n)
    SnapshotStore.publish(IndexMaintenance.buildIndex(
      oldCorpus, k = 2, rounds = 2, dim = Dim), root)

    // the drift switch: epoch 0 serves the training distribution, later
    // epochs the straddling one
    @volatile var drifted = false
    def vecs(s: org.apache.spark.sql.SparkSession): DataFrame =
      if (drifted) liveCorpus else oldCorpus
    def qs(s: org.apache.spark.sql.SparkSession): DataFrame =
      vecs(s).filter(col("vec_id") < 16).toDF("qid", "qv")
    val ann = CorpusStream.AnnMaintenance(root, vecs, qs,
      floorMilli = 800L, k = 2, rounds = 2, dim = Dim)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val q = CorpusStream.run(mem.toDF(),
      CorpusJob.Config(input = sf(), out = out), n, None, Some(ann))
    try {
      val epochs = docEpochs
      mem.addData(epochs(0)); q.processAllAvailable()
      assert(SnapshotStore.currentVersion(root) === Some(0L),
        "healthy epoch must not republish")
      drifted = true
      mem.addData(epochs(1)); q.processAllAvailable()
      assert(SnapshotStore.currentVersion(root) === Some(1L),
        "drifted epoch must republish exactly once")
      mem.addData(epochs(2)); q.processAllAvailable()
      assert(SnapshotStore.currentVersion(root) === Some(1L),
        "post-retrain epoch must be a no-op again")
    } finally q.stop()
    // the retrained index is above the floor on the live distribution
    assert(IndexMaintenance.recallMilli(SnapshotStore.read(spark, root),
      liveCorpus, liveCorpus.filter(col("vec_id") < 16).toDF("qid", "qv"),
      topK = 3) >= 800L)
  }

  test("failure mid-republish leaves the old snapshot live, never blocks ingest, retries next epoch") {
    val root = Files.createTempDirectory("graft-stream-maint-crash").toString
    val out = Files.createTempDirectory("graft-stream-maint-crash-out").toString
    val n = CorpusStream.names("graft_smaint_crash")
    CorpusStream.reset(spark, n)
    SnapshotStore.publish(IndexMaintenance.buildIndex(
      oldCorpus, k = 2, rounds = 2, dim = Dim), root)

    def vecs(s: org.apache.spark.sql.SparkSession): DataFrame = liveCorpus
    def qs(s: org.apache.spark.sql.SparkSession): DataFrame =
      liveCorpus.filter(col("vec_id") < 16).toDF("qid", "qv")
    // fault injection through the publish protocol's own validator seam:
    // the retrain stages + validates the new index, then dies BEFORE the
    // snapshot swap — the deepest mid-republish crash point (earlier
    // points are SnapshotStoreSpec's kill-at-every-step territory)
    @volatile var poison = true
    val ann = CorpusStream.AnnMaintenance(root, vecs, qs,
      floorMilli = 800L, k = 2, rounds = 2, dim = Dim,
      validator = _ => if (poison) sys.error("injected crash before the swap"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val q = CorpusStream.run(mem.toDF(),
      CorpusJob.Config(input = sf(), out = out), n, None, Some(ann))
    try {
      mem.addData(docEpochs(0)); q.processAllAvailable()
      // ingest committed (maintenance failure must not block documents)...
      assert(spark.table(n.meta).count() === 1L)
      // ...and the old snapshot is still the live one, fully readable
      assert(SnapshotStore.currentVersion(root) === Some(0L))
      assert(SnapshotStore.read(spark, root).count() > 0)
      // next epoch: fault cleared, the retry republishes
      poison = false
      mem.addData(docEpochs(1)); q.processAllAvailable()
      assert(SnapshotStore.currentVersion(root) === Some(1L),
        "maintenance must retry and succeed once the fault clears")
    } finally q.stop()
  }
}
