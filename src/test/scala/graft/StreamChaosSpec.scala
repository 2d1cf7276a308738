package graft

import graft.pipeline.{CorpusJob, CorpusStream}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

/** Executor-loss chaos on the STREAMING ingest path — the round-12 gap:
  * CorpusStreamCrashSpec kills the write protocol between steps
  * (driver-simulated), ChaosSpec kills an executor mid-batch-CC; neither
  * had ever landed a kill inside a live `foreachBatch` epoch of
  * [[CorpusStream.run]]. This suite does, on a real multi-process
  * `local-cluster[2,2,2048]` with a DURABLE streaming checkpoint, and
  * pins the epoch-replay contract as measured fact:
  *
  *  - the ingest reaches the final watermark through the loss — either
  *    the same query absorbs it via task retry, or the failed query is
  *    RESTARTED over the same checkpoint + state and Structured Streaming
  *    replays the in-flight epoch with the same batchId (the replay the
  *    epoch-keyed idempotent transition exists for);
  *  - no epoch is skipped or double-applied: the committed meta epochs
  *    are exactly the contiguous set {0..K-1} (`ingestUpTo`'s
  *    watermark-successor check), each exactly once;
  *  - the final published snapshot is row-identical to one batch
  *    [[CorpusJob.execute]] over the union — the same equivalence the
  *    unkilled StatefulStreamingSpec run pins, now holding through a
  *    SIGKILL.
  *
  * Vacuity guards mirror ChaosSpec: the kill must land while ≥3 task
  * slots are busy inside an uncommitted epoch, an executor-removed event
  * must arrive, and at least one task must FAIL — a kill that lands in a
  * scheduling lull is discarded and the whole arm re-runs with fresh
  * state (up to 3 attempts).
  */
class StreamChaosSpec extends SparkSpec with BeforeAndAfterAll {

  private val dataDir = sf()
  private var cluster: SparkSession = _
  private var expected: Seq[Seq[Any]] = _
  private var allDocs: Seq[org.apache.spark.sql.Row] = _

  private object listener extends SparkListener {
    val executorsAdded = new AtomicInteger(0)
    val executorsRemoved = new AtomicInteger(0)
    val jobsEnded = new AtomicInteger(0)
    val lastJobEndNanos = new AtomicLong(0L)
    val runningTasks = new AtomicInteger(0)
    val taskFailures = new AtomicInteger(0)
    override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit =
      executorsAdded.incrementAndGet()
    override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
      executorsRemoved.incrementAndGet()
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      jobsEnded.incrementAndGet()
      lastJobEndNanos.set(System.nanoTime())
    }
    override def onTaskStart(e: SparkListenerTaskStart): Unit =
      runningTasks.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      runningTasks.decrementAndGet()
      if (e.reason != org.apache.spark.Success) taskFailures.incrementAndGet()
    }
    def live: Int = executorsAdded.get() - executorsRemoved.get()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the batch-run baseline comes from the ordinary shared session; then
    // free the JVM's one SparkContext slot for the multi-process cluster
    val outBatch = Files.createTempDirectory("graft-schaos-batch").toString
    expected = rows(CorpusJob.execute(spark,
      CorpusJob.Config(input = dataDir, out = outBatch))._1)
    allDocs = Tables.documents(spark, dataDir).collect()
      .sortBy(_.getLong(0)).toSeq
    spark.stop()
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    cluster = Sessions.withGraftConf(SparkSession.builder()
        .master("local-cluster[2,2,2048]")
        .appName("graft-stream-chaos")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    cluster.sparkContext.addSparkListener(listener)
    waitFor("2 executors up", 120.seconds)(listener.live >= 2)
  }

  override def afterAll(): Unit = {
    if (cluster != null) cluster.stop()
    super.afterAll()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def waitFor(what: String, timeout: Duration)(ok: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeout.toNanos
    while (!ok) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  private def killOneExecutor(): Long = {
    val victims = ProcessHandle.current().descendants().iterator().asScala
      .filter(p => p.info().command().orElse("").contains("java"))
      .toList
    assert(victims.nonEmpty, "no executor JVM found among this JVM's descendants")
    val v = victims.minBy(_.pid())
    assert(v.destroyForcibly(), s"SIGKILL of executor pid ${v.pid()} refused")
    v.pid()
  }

  /** Land one docs batch as a single parquet file in the stream's watched
    * directory (atomic move so the file source never reads a partial).
    */
  private def land(docs: Seq[org.apache.spark.sql.Row], dir: String,
                   name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-schaos-land").toString
    cluster.createDataFrame(docs.asJava,
        Tables.documents(cluster, dataDir).schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail(s"no parquet part written under $tmp"))
    Files.move(part, Paths.get(dir, name))
  }

  /** One full chaos attempt with fresh state. Returns (final snapshot
    * rows or failure, committed epoch multiset, disruption proven).
    */
  private def attempt(id: Int): (Either[Throwable, Seq[Seq[Any]]],
                                 Seq[Long], Boolean) = {
    val landing = Files.createTempDirectory(s"graft-schaos-src$id").toString
    val outStream = Files.createTempDirectory(s"graft-schaos-out$id").toString
    val ckpt = Files.createTempDirectory(s"graft-schaos-ck$id").toString
    val n = CorpusStream.names(s"graft_schaos_$id")
    CorpusStream.reset(cluster, n)
    val cfg = CorpusJob.Config(input = dataDir, out = outStream)
    val parts = allDocs.grouped(math.ceil(allDocs.length / 3.0).toInt).toSeq
    def source = cluster.readStream
      .schema(Tables.documents(cluster, dataDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)

    // epoch 0 commits cleanly first, so the kill lands in a LATER epoch
    // and the post-loss resume must respect the standing watermark
    land(parts(0), landing, "b0.parquet")
    var q = CorpusStream.run(source, cfg, n, checkpointDir = Some(ckpt))
    q.processAllAvailable()

    val jobsBefore = listener.jobsEnded.get()
    val failuresBefore = listener.taskFailures.get()
    val removedBefore = listener.executorsRemoved.get()
    land(parts(1), landing, "b1.parquet")
    Thread.sleep(50) // distinct mtimes => deterministic file order
    land(parts(2), landing, "b2.parquet")
    // wait until epoch 1 is genuinely in flight: jobs are finishing and
    // ≥3 of the 4 task slots are busy — then SIGKILL one executor JVM.
    // If the remaining epochs drain before a kill window opens (tasks too
    // short), the attempt is declared non-disruptive and retried rather
    // than timing out.
    val deadline = System.nanoTime() + 180.seconds.toNanos
    var readyToKill = false
    while (!readyToKill) {
      if (System.nanoTime() > deadline) fail("timed out waiting for epoch work")
      readyToKill = listener.jobsEnded.get() >= jobsBefore + 2 &&
        listener.runningTasks.get() >= 3
      if (!readyToKill &&
          !q.status.isTriggerActive && !q.status.isDataAvailable) {
        info("epochs drained before a kill window opened — non-disruptive")
        try q.stop() catch { case _: Throwable => () }
        return (Right(rows(cluster.read.parquet(outStream))), Seq.empty, false)
      }
      Thread.sleep(50)
    }
    val pid = killOneExecutor()
    val killNanos = System.nanoTime()

    val out: Either[Throwable, Seq[Seq[Any]]] =
      try {
        q.processAllAvailable()
        Right(rows(cluster.read.parquet(outStream)))
      } catch {
        case e: Throwable =>
          info(s"query failed after the kill (${e.getClass.getSimpleName}) — " +
            "restarting over the same checkpoint: the replay arm")
          try { if (q.isActive) q.stop() } catch { case _: Throwable => () }
          waitFor("replacement executor", 120.seconds)(listener.live >= 2)
          try {
            q = CorpusStream.run(source, cfg, n, checkpointDir = Some(ckpt))
            q.processAllAvailable()
            Right(rows(cluster.read.parquet(outStream)))
          } catch { case e2: Throwable => Left(e2) }
      } finally {
        try { if (q != null && q.isActive) q.stop() }
        catch { case _: Throwable => () }
      }
    waitFor("executor-removed event", 60.seconds)(
      listener.executorsRemoved.get() > removedBefore)
    val failed = listener.taskFailures.get() - failuresBefore
    info(s"killed executor pid $pid; failed tasks: $failed; removed: " +
      s"${listener.executorsRemoved.get() - removedBefore}")
    val epochs =
      if (cluster.catalog.tableExists(n.meta))
        cluster.table(n.meta).select("epoch").collect().map(_.getLong(0)).toSeq
      else Seq.empty
    val disrupted = listener.lastJobEndNanos.get() > killNanos && failed > 0
    (out, epochs, disrupted)
  }

  test("SIGKILL mid-foreachBatch epoch: ingest reaches the watermark, no epoch skipped or doubled, snapshot row-identical") {
    var result: (Either[Throwable, Seq[Seq[Any]]], Seq[Long], Boolean) = null
    var i = 0
    while (i < 3 && (result == null || !result._3)) {
      if (i > 0) {
        info(s"attempt $i was non-disruptive; retrying with fresh state")
        waitFor("replacement executor", 120.seconds)(listener.live >= 2)
      }
      result = attempt(i)
      i += 1
    }
    assert(result._3, s"no attempt of $i landed a disruptive kill " +
      "(failed tasks + post-kill progress) — chaos arm NOT exercised")
    result._1 match {
      case Right(got) =>
        assert(got === expected,
          "stream survived the kill but the published snapshot differs " +
            "from the batch run — corruption, not recovery")
      case Left(e) => fail(
        "the stream (or its checkpoint restart) must reach the final " +
          s"watermark through an executor loss; failed: ${e.getMessage}")
    }
    // commit markers: the committed epoch SET is exactly the contiguous
    // {0,1,2} — a skipped epoch would leave a gap, and a double-APPLY of
    // data is excluded by the row-identity assertion above (the meta read
    // is duplicate-marker-tolerant by design, so the set, not the
    // multiset, is the contract)
    val epochs = result._2.distinct.sorted
    assert(epochs === Seq(0L, 1L, 2L),
      s"committed epochs ${epochs.mkString(",")} — expected exactly 0,1,2")
  }
}
