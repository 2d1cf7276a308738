package graft

import graft.pipeline.{CorpusJob, CorpusStream}
import org.apache.spark.sql.functions._

/** Crash consistency of the streaming curation state transition:
  * Structured Streaming replays a failed micro-batch with the same
  * batchId, and the failure can land between any two state writes. A
  * naive multi-table append is not retry-safe — if the hash table
  * advanced but the survivor table didn't, the replay computes "no new
  * hashes" and silently loses the batch's documents. These tests kill
  * the epoch-1 transition after every write prefix (0..8 of its 8
  * writes — 8 = committed, exercising the replay no-op guard), replay
  * it, ingest one more epoch, and require the final published corpus to
  * be row-identical to the clean run: the SnapshotStoreSpec
  * kill-at-every-point discipline applied to the multi-table head state.
  */
class CorpusStreamCrashSpec extends SparkSpec {

  private val d = sf()
  private def docs = Tables.documents(spark, d).filter(col("doc_id") < 240)
  private def epochs = Seq(
    docs.filter(col("doc_id") < 80),
    docs.filter(col("doc_id") >= 80 && col("doc_id") < 160),
    docs.filter(col("doc_id") >= 160))

  private lazy val cleanOut = {
    val out = java.nio.file.Files.createTempDirectory("graft-crash-clean").toString
    val n = CorpusStream.names("graft_crash_clean")
    CorpusStream.reset(spark, n)
    epochs.zipWithIndex.foreach { case (b, i) =>
      CorpusStream.ingest(spark, b, n, i.toLong)
    }
    CorpusStream.publish(spark, n, CorpusJob.Config(input = d, out = out))
      ._1.localCheckpoint(true)
  }

  test("out-of-order batch (ids at or below the standing max) fails loudly") {
    val n = CorpusStream.names("graft_crash_ooo")
    CorpusStream.reset(spark, n)
    CorpusStream.ingest(spark, epochs(1), n, 0L) // ids 80..159 first
    // a replayed old shard: ids 0..79 sit below the standing max 159 —
    // admitting it would silently lose every doc to established keepers
    val e = intercept[IllegalArgumentException] {
      CorpusStream.ingest(spark, epochs(0), n, 1L)
    }
    assert(e.getMessage.contains("does not exceed the standing max"))
  }

  test("gapped epoch (not the watermark successor) fails loudly") {
    val n = CorpusStream.names("graft_crash_gap")
    CorpusStream.reset(spark, n)
    CorpusStream.ingest(spark, epochs(0), n, 0L)
    val e = intercept[IllegalArgumentException] {
      CorpusStream.ingest(spark, epochs(1), n, 2L) // skips epoch 1
    }
    assert(e.getMessage.contains("successor"))
  }

  test("legacy (epoch)-only meta: reads refuse loudly, explicit migration upgrades, gapped state fails") {
    import spark.implicits._
    val n = CorpusStream.names("graft_crash_legacy")
    CorpusStream.reset(spark, n)
    CorpusStream.ingest(spark, epochs(0), n, 0L)
    // downgrade the meta table to the legacy single-column schema (state
    // written by the pre-round-9 code)
    val eps = spark.table(n.meta).select("epoch").collect().map(_.getLong(0)).toSeq
    eps.toDF("epoch").write.mode("overwrite").format("parquet").saveAsTable(n.meta)
    // reads must NOT migrate lazily (an in-place rewrite from a read path
    // could lose every commit marker on a crash) — they refuse and name
    // the explicit entry point
    val e0 = intercept[IllegalStateException] {
      CorpusStream.ingest(spark, epochs(1), n, 1L)
    }
    assert(e0.getMessage.contains("migrateLegacyMeta"))
    CorpusStream.migrateLegacyMeta(spark, n)
    CorpusStream.ingest(spark, epochs(1), n, 1L)
    assert(spark.table(n.meta).columns.contains("max_doc_id"))
    val rows = spark.table(n.meta).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(0L) === -1L, s"migrated marker must carry the sentinel: $rows")
    assert(rows(1L) === 159L, s"new epoch must record its real max: $rows")
    // GAPPED legacy state could expose a crashed epoch's partials under
    // the contiguous range read — must refuse, not resume wrong
    val n2 = CorpusStream.names("graft_crash_legacy_gap")
    CorpusStream.reset(spark, n2)
    Seq(0L, 2L).toDF("epoch").write.mode("overwrite").format("parquet")
      .saveAsTable(n2.meta)
    val e = intercept[IllegalArgumentException] {
      CorpusStream.migrateLegacyMeta(spark, n2)
    }
    assert(e.getMessage.contains("non-contiguous"))
  }

  for (cut <- 0 to 4) {
    test(s"meta migration crashed after $cut/4 steps never loses a commit marker") {
      import spark.implicits._
      val n = CorpusStream.names(s"graft_crash_mig_$cut")
      CorpusStream.reset(spark, n)
      CorpusStream.ingest(spark, epochs(0), n, 0L)
      val eps = spark.table(n.meta).select("epoch").collect().map(_.getLong(0)).toSeq
      eps.toDF("epoch").write.mode("overwrite").format("parquet").saveAsTable(n.meta)
      CorpusStream.migrateLegacyMetaUpTo(spark, n, cut) // the crash
      // recovery: before the commit point (cut <= 1) the legacy table is
      // untouched and the migration re-runs; after it, the retired marker
      // lets the swap resume — in both cases every marker survives
      CorpusStream.migrateLegacyMeta(spark, n)
      assert(spark.table(n.meta).columns.contains("max_doc_id"))
      assert(spark.table(n.meta).select("epoch").collect().map(_.getLong(0)).toSet
        === eps.toSet, s"commit markers lost by a crash at step $cut")
      assert(!spark.catalog.tableExists(s"${n.meta}__migrating") &&
             !spark.catalog.tableExists(s"${n.meta}__retired"),
        "migration side tables must not linger after completion")
      // the stream resumes: next epoch ingests against the migrated state
      CorpusStream.ingest(spark, epochs(1), n, 1L)
    }
  }

  test("migration crash between the renames auto-resumes from the read path") {
    import spark.implicits._
    val n = CorpusStream.names("graft_crash_mig_read")
    CorpusStream.reset(spark, n)
    CorpusStream.ingest(spark, epochs(0), n, 0L)
    val eps = spark.table(n.meta).select("epoch").collect().map(_.getLong(0)).toSeq
    eps.toDF("epoch").write.mode("overwrite").format("parquet").saveAsTable(n.meta)
    CorpusStream.migrateLegacyMetaUpTo(spark, n, 2) // meta absent, marker live
    assert(!spark.catalog.tableExists(n.meta))
    // a bare read (no explicit migration call) finds the retired marker and
    // finishes the swap instead of treating the stream as fresh
    CorpusStream.ingest(spark, epochs(1), n, 1L)
    assert(spark.table(n.meta).select("epoch").collect().map(_.getLong(0)).toSet
      === Set(0L, 1L))
  }

  test("vacuum drops superseded comps snapshots; publish still serves the watermark") {
    val out = java.nio.file.Files.createTempDirectory("graft-crash-vac").toString
    val n = CorpusStream.names("graft_crash_vac")
    CorpusStream.reset(spark, n)
    epochs.zipWithIndex.foreach { case (b, i) =>
      CorpusStream.ingest(spark, b, n, i.toLong)
    }
    assert(CorpusStream.vacuum(spark, n) === 2) // epochs 0 and 1 superseded
    assert(CorpusStream.vacuum(spark, n) === 0) // idempotent
    val eps = spark.table(n.comps).select("epoch").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(eps === Set(2L), eps.toString)
    val (got, _) = CorpusStream.publish(spark, n,
      CorpusJob.Config(input = d, out = out))
    assert(got.exceptAll(cleanOut).isEmpty && cleanOut.exceptAll(got).isEmpty)
  }

  for (cut <- 0 to 8) {
    test(s"replay after a crash $cut/8 writes into epoch 1 converges") {
      val out = java.nio.file.Files.createTempDirectory(s"graft-crash-$cut").toString
      val n = CorpusStream.names(s"graft_crash_$cut")
      CorpusStream.reset(spark, n)
      CorpusStream.ingest(spark, epochs(0), n, 0L)
      CorpusStream.ingestUpTo(spark, epochs(1), n, 1L, cut) // the crash
      CorpusStream.ingest(spark, epochs(1), n, 1L)          // the replay
      CorpusStream.ingest(spark, epochs(2), n, 2L)
      val (got, _) = CorpusStream.publish(spark, n,
        CorpusJob.Config(input = d, out = out))
      assert(got.exceptAll(cleanOut).isEmpty && cleanOut.exceptAll(got).isEmpty,
        s"state diverged after a crash at write $cut")
    }
  }
}
