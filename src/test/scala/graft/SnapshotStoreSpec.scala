package graft

import graft.sinks.SnapshotStore
import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}

/** The transactional publish contract: a crashed or aborted publish leaves
  * the previous snapshot live and readable, a re-run converges, the
  * pointer swap is all-or-nothing, and MERGE composes with it.
  */
class SnapshotStoreSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-snap").toString

  private def frame(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("k", "status", "price")
  }

  private def slurp(root: String): Set[(Long, String, Double)] =
    SnapshotStore.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("publish/read roundtrip, version monotonicity, manifest") {
    val root = tmpRoot()
    val v1 = SnapshotStore.publish(frame((1L, "O", 10.0), (2L, "F", 20.0)), root)
    assert(v1 === 0L)
    assert(slurp(root) === Set((1L, "O", 10.0), (2L, "F", 20.0)))
    val v2 = SnapshotStore.publish(frame((1L, "O", 11.0)), root)
    assert(v2 === 1L)
    assert(SnapshotStore.currentVersion(root) === Some(1L))
    assert(slurp(root) === Set((1L, "O", 11.0)))
    // previous snapshot remains readable (time travel / rollback target)
    assert(SnapshotStore.readVersion(spark, root, v1).count() === 2)
    val manifest = new String(Files.readAllBytes(
      Paths.get(root, "v00000001", "_MANIFEST.json")), "UTF-8")
    assert(manifest.contains("\"rows\":1"))
  }

  test("aborted publish (validator throws) leaves the old snapshot live; re-run converges") {
    val root = tmpRoot()
    SnapshotStore.publish(frame((1L, "O", 10.0)), root)
    val e = intercept[RuntimeException] {
      SnapshotStore.publish(frame((9L, "X", 99.0)), root,
        validator = _ => throw new RuntimeException("invariant violated"))
    }
    assert(e.getMessage === "invariant violated")
    // pointer untouched, old data intact
    assert(SnapshotStore.currentVersion(root) === Some(0L))
    assert(slurp(root) === Set((1L, "O", 10.0)))
    // the orphan staging dir from the abort exists until the next publish sweeps it
    val staged = Files.list(Paths.get(root, "_staging"))
    val orphans = try staged.count() finally staged.close()
    assert(orphans === 1)
    // re-run converges: next publish succeeds and becomes live
    SnapshotStore.publish(frame((9L, "X", 99.0)), root)
    assert(slurp(root) === Set((9L, "X", 99.0)))
    val staged2 = Files.list(Paths.get(root, "_staging"))
    val after = try staged2.count() finally staged2.close()
    assert(after === 0) // sweep happened
  }

  test("kill between version rename and pointer swap: old snapshot stays live, version not reused") {
    val root = tmpRoot()
    SnapshotStore.publish(frame((1L, "O", 10.0)), root)
    // simulate the crash point: a fully-written version dir exists but
    // _CURRENT was never swapped (v1 orphaned)
    frame((7L, "Z", 7.0)).write.parquet(Paths.get(root, "v00000001").toString)
    assert(SnapshotStore.currentVersion(root) === Some(0L))
    assert(slurp(root) === Set((1L, "O", 10.0))) // readers never see the orphan
    // re-run: must skip the orphaned number, not clobber it
    val v = SnapshotStore.publish(frame((7L, "Z", 7.0)), root)
    assert(v === 2L)
    assert(slurp(root) === Set((7L, "Z", 7.0)))
  }

  test("mid-staging garbage never surfaces and is swept by the next publish") {
    val root = tmpRoot()
    SnapshotStore.publish(frame((1L, "O", 10.0)), root)
    // simulate a writer killed mid-write: half-baked files in _staging
    val junk = Paths.get(root, "_staging", "v00000001-deadbeef")
    Files.createDirectories(junk)
    Files.write(junk.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(slurp(root) === Set((1L, "O", 10.0)))
    SnapshotStore.publish(frame((2L, "F", 20.0)), root)
    assert(!Files.exists(junk))
    assert(slurp(root) === Set((2L, "F", 20.0)))
  }

  test("mergeUpsertPublish: matched rows update, new keys insert, atomically versioned") {
    val root = tmpRoot()
    SnapshotStore.publish(frame((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 30.0)), root)
    val changes = frame((2L, "U", 22.0), (9L, "N", 90.0))
    val v = SnapshotStore.mergeUpsertPublish(spark, root, changes, "k")
    assert(v === 1L)
    assert(slurp(root) === Set(
      (1L, "O", 10.0), (2L, "U", 22.0), (3L, "O", 30.0), (9L, "N", 90.0)))
    // the pre-merge snapshot is still intact for rollback
    assert(SnapshotStore.readVersion(spark, root, 0L).count() === 3)
    // schema mismatch is rejected before anything is staged
    import spark.implicits._
    intercept[IllegalArgumentException] {
      SnapshotStore.mergeUpsertPublish(spark, root,
        Seq((1L, "x")).toDF("k", "status"), "k")
    }
  }

  test("vacuum retains the newest keep versions plus the live one") {
    val root = tmpRoot()
    (0 until 4).foreach(i => SnapshotStore.publish(frame((i.toLong, "O", i.toDouble)), root))
    SnapshotStore.vacuum(root, keep = 2)
    assert(!Files.exists(Paths.get(root, "v00000000")))
    assert(!Files.exists(Paths.get(root, "v00000001")))
    assert(Files.exists(Paths.get(root, "v00000002")))
    assert(Files.exists(Paths.get(root, "v00000003")))
    assert(slurp(root) === Set((3L, "O", 3.0)))
  }
}
