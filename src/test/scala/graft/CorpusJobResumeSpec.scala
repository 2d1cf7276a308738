package graft

import graft.pipeline.{CorpusJob, StageStore}
import org.apache.spark.sql.DataFrame

/** Stage-boundary resume for the batch curation job: with `--resume-dir`
  * set, sealed stages are read back instead of recomputed, a config edit
  * invalidates exactly its downstream suffix (fingerprint chain), a torn
  * stage (crash before its marker) recomputes and converges, and a stale
  * dir from a different input is never trusted. Throughout, the resumed
  * output must be row-identical to the un-resumable run — resume is a
  * recovery feature, never a semantics change.
  */
class CorpusJobResumeSpec extends SparkSpec {

  private def freshOut() =
    java.nio.file.Files.createTempDirectory("graft-resume-out").toString
  private val resumeDir =
    java.nio.file.Files.createTempDirectory("graft-resume-store").toString
  private val cfg = CorpusJob.Config(input = sf("sf0.001"), out = freshOut(),
    resumeDir = resumeDir)

  // default config activates 10 stages (exact, bow, near, clean0, fuzzy,
  // spancut, screened, quality, budget, mixed); mm + diverse are opt-in
  private val ActiveStages = 10

  private def rows(df: DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  private lazy val first = {
    val store = new StageStore(spark, resumeDir, cfg.input)
    val (out, f) = CorpusJob.executeWith(spark, cfg, store)
    (rows(out), f, store)
  }

  test("first run seals every active stage; output ≡ the un-resumable run") {
    val (outRows, f, store) = first
    assert(store.hits === 0 && store.misses === ActiveStages,
      s"hits=${store.hits} misses=${store.misses}")
    val (outPlain, fPlain) = CorpusJob.execute(spark,
      cfg.copy(out = freshOut(), resumeDir = ""))
    assert(f === fPlain, "funnel must be identical with and without resume")
    assert(rows(outPlain) === outRows, "curated rows must be identical")
  }

  test("a re-run reads every sealed stage back (zero recompute)") {
    val (outRows, f, _) = first
    val store = new StageStore(spark, resumeDir, cfg.input)
    val (out, f2) = CorpusJob.executeWith(spark, cfg.copy(out = freshOut()), store)
    assert(store.hits === ActiveStages && store.misses === 0,
      s"hits=${store.hits} misses=${store.misses}")
    assert(f2 === f)
    assert(rows(out) === outRows)
  }

  test("a downstream knob change re-runs exactly the invalidated suffix") {
    first // ensure the dir is sealed under the base config
    val cfg2 = cfg.copy(out = freshOut(), minTokens = 12)
    val store = new StageStore(spark, resumeDir, cfg2.input)
    val (out, f) = CorpusJob.executeWith(spark, cfg2, store)
    // exact/bow/near/clean0/fuzzy/spancut stay sealed; screened (the
    // edited knob) and everything after it recompute
    assert(store.hits === 6 && store.misses === 4,
      s"hits=${store.hits} misses=${store.misses}")
    val (outPlain, fPlain) = CorpusJob.execute(spark,
      cfg2.copy(out = freshOut(), resumeDir = ""))
    assert(f === fPlain)
    assert(rows(out) === rows(outPlain))
    // re-seal the dir under the base config for the tests below
    CorpusJob.executeWith(spark, cfg.copy(out = freshOut()),
      new StageStore(spark, resumeDir, cfg.input))
  }

  test("a torn stage (marker lost mid-crash) recomputes and converges") {
    val (outRows, f, _) = first
    val marker = java.nio.file.Paths.get(resumeDir, "near", "_DONE")
    assert(java.nio.file.Files.deleteIfExists(marker), "fixture: near sealed")
    val store = new StageStore(spark, resumeDir, cfg.input)
    val (out, f2) = CorpusJob.executeWith(spark, cfg.copy(out = freshOut()), store)
    assert(store.misses === 1 && store.hits === ActiveStages - 1,
      s"hits=${store.hits} misses=${store.misses}")
    assert(f2 === f)
    assert(rows(out) === outRows)
  }

  test("rewritten data at the SAME path invalidates every sealed stage") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // a private copy of the corpus whose file we can legally touch
    val dataDir = Files.createTempDirectory("graft-resume-data")
    Files.copy(Paths.get(sf("sf0.001"), "documents.parquet"),
      dataDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val rd = Files.createTempDirectory("graft-resume-store2").toString
    val c = cfg.copy(input = dataDir.toString, out = freshOut(), resumeDir = rd)
    def contentSeed() = // exactly what CorpusJob.execute seeds with
      c.input + "|" + StageStore.contentFingerprint(spark, c.input)
    val s1 = new StageStore(spark, rd, contentSeed())
    CorpusJob.executeWith(spark, c, s1)
    assert(s1.misses === ActiveStages)
    // same path, same bytes, NEW mtime — the make/rsync staleness test
    // must recompute (path identity alone would silently reuse the seal)
    val f = dataDir.resolve("documents.parquet").toFile
    assert(f.setLastModified(f.lastModified() + 60000L))
    val s2 = new StageStore(spark, rd, contentSeed())
    CorpusJob.executeWith(spark, c.copy(out = freshOut()), s2)
    assert(s2.hits === 0 && s2.misses === ActiveStages,
      s"stale seal reused: hits=${s2.hits} misses=${s2.misses}")
    // untouched data resumes fully again
    val s3 = new StageStore(spark, rd, contentSeed())
    CorpusJob.executeWith(spark, c.copy(out = freshOut()), s3)
    assert(s3.hits === ActiveStages && s3.misses === 0)
  }

  test("orphan _DONE.tmp markers from crashed seals are swept on recompute") {
    first
    val near = java.nio.file.Paths.get(resumeDir, "near")
    val orphan = near.resolve("_DONE.tmp-deadbeef")
    java.nio.file.Files.write(orphan, "stale".getBytes("UTF-8"))
    // lose the real marker too: the stage recomputes and must sweep
    java.nio.file.Files.deleteIfExists(near.resolve("_DONE"))
    val store = new StageStore(spark, resumeDir, cfg.input)
    CorpusJob.executeWith(spark, cfg.copy(out = freshOut()), store)
    assert(store.misses === 1)
    assert(!java.nio.file.Files.exists(orphan), "orphan tmp marker not swept")
    assert(java.nio.file.Files.exists(near.resolve("_DONE")))
  }

  test("a stale dir (different input fingerprint) is recomputed, not trusted") {
    val (outRows, f, _) = first
    val store = new StageStore(spark, resumeDir, "some/other/corpus")
    val (out, f2) = CorpusJob.executeWith(spark, cfg.copy(out = freshOut()), store)
    assert(store.hits === 0 && store.misses === ActiveStages,
      s"hits=${store.hits} misses=${store.misses}")
    assert(f2 === f)
    assert(rows(out) === outRows)
  }
}
