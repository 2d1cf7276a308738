package graft

import graft.operators.Materialize
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}
import scala.jdk.CollectionConverters._

/** Executor-LOSS fault injection: every other crash suite here kills a
  * write protocol between steps; this one kills an executor JVM (SIGKILL,
  * no shutdown hooks) in the middle of the iterative CC star-contraction
  * loop on a real multi-process `local-cluster[2,2,2048]` — two
  * standalone workers, each forking a separate executor process — and
  * pins [[Materialize]]'s documented durability contract as measured
  * fact rather than design claim:
  *
  *  - RELIABLE mode (`spark.graft.checkpoint.dir` set): the job COMPLETES
  *    despite the kill — lost cache/shuffle blocks recompute from the
  *    filesystem-backed round checkpoints — and the output is
  *    row-identical to an unkilled run;
  *  - default localCheckpoint mode: the same kill may be fatal (the
  *    killed executor's checkpoint blocks have no lineage to recompute
  *    from — exactly what the scaladoc warns), but it must NEVER yield a
  *    silently wrong answer: the run either fails loudly or returns the
  *    exact rows.
  *
  * Harness notes: suites share one forked JVM and run sequentially, so
  * this suite stops the shared local[4] session up front and restores
  * nothing — the next suite's `SparkSpec.session` getOrCreate sees the
  * stopped context and builds a fresh one. The kill must land mid-run to
  * prove anything: each arm asserts the executor-removed event arrived
  * AND at least one Spark job finished AFTER the kill (i.e. the app was
  * still computing when the process died), failing loudly as
  * NOT-EXERCISED instead of passing vacuously if the workload raced the
  * kill.
  */
class ChaosSpec extends SparkSpec with BeforeAndAfterAll {

  private val dataDir = sf("sf0.1")

  private var cluster: SparkSession = _
  private var expected: Seq[Seq[Any]] = _

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
    // baseline from the ordinary shared session, then free the JVM's one
    // SparkContext slot for the multi-process cluster
    expected = rows(graft.queries.DedupQueries.clusters(spark, dataDir))
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
        .appName("graft-chaos")
        .config("spark.sql.shuffle.partitions", "8")
        // forked executor JVMs need the test classpath and the JDK17 opens
        // (spark-submit normally injects both)
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        // the worker-side launcher resolves the executor classpath via
        // getScalaVersion(); outside spark-class nothing exported
        // SPARK_SCALA_VERSION, so pass it through the executor env
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

  /** SIGKILL one executor JVM. The workers run inside THIS JVM and fork
    * the executor processes, so the app's executors are exactly this
    * JVM's java descendants — matched via `descendants()` + the
    * executable name, because /proc cmdline is TRUNCATED by the JDK for
    * the executors' multi-kilobyte classpaths (probe-verified: a 60 KB
    * `-cp` child reports a 7-char command line), which rules out
    * matching on class or app id. Returns the killed pid.
    */
  private def killOneExecutor(): Long = {
    val victims = ProcessHandle.current().descendants().iterator().asScala
      .filter(p => p.info().command().orElse("").contains("java"))
      .toList
    assert(victims.nonEmpty, "no executor JVM found among this JVM's descendants")
    val v = victims.minBy(_.pid())
    assert(v.destroyForcibly(), s"SIGKILL of executor pid ${v.pid()} refused")
    v.pid()
  }

  /** Run the CC query on the cluster session, SIGKILLing an executor once
    * the run is a couple of Spark jobs deep AND ≥3 of the cluster's 4
    * task slots are busy — so the victim is mid-task and its death FAILS
    * running tasks, not just removes an idle process. Returns (outcome,
    * proof that the kill disrupted a live computation: a job ended after
    * the kill and at least one task failed). A kill can still land in a
    * lull (tasks are short); the caller retries the whole arm rather
    * than accepting vacuous evidence.
    */
  private def runWithKill(): (Either[Throwable, Seq[Seq[Any]]], Boolean) = {
    val jobsBefore = listener.jobsEnded.get()
    val removedBefore = listener.executorsRemoved.get()
    val failuresBefore = listener.taskFailures.get()
    val fut = Future(rows(graft.queries.DedupQueries.clusters(cluster, dataDir)))
    waitFor("the iterative loop to be in flight", 180.seconds)(
      fut.isCompleted || (listener.jobsEnded.get() >= jobsBefore + 2 &&
        listener.runningTasks.get() >= 3))
    assert(!fut.isCompleted,
      "workload finished before the kill point — enlarge it, the chaos arm is vacuous")
    val pid = killOneExecutor()
    val killNanos = System.nanoTime()
    val out = try Right(Await.result(fut, 10.minutes))
      catch { case e: Throwable => Left(e) }
    waitFor("executor-removed event", 60.seconds)(
      listener.executorsRemoved.get() > removedBefore)
    val failed = listener.taskFailures.get() - failuresBefore
    info(s"killed executor pid $pid mid-task; removed events: " +
      s"${listener.executorsRemoved.get() - removedBefore}; failed tasks: $failed")
    val disrupted = listener.lastJobEndNanos.get() > killNanos && failed > 0
    (out, disrupted)
  }

  /** Retry wrapper: the arm must observe a DISRUPTIVE kill (failed tasks)
    * to prove anything; a kill that lands in a scheduling lull is
    * discarded and the arm re-runs, up to 3 attempts.
    */
  private def runWithDisruptiveKill(): Either[Throwable, Seq[Seq[Any]]] = {
    var last: (Either[Throwable, Seq[Seq[Any]]], Boolean) = (null, false)
    var attempt = 0
    while (attempt < 3 && !last._2) {
      if (attempt > 0) {
        info(s"attempt $attempt was non-disruptive; retrying")
        waitFor("replacement executor", 120.seconds)(listener.live >= 2)
      }
      last = runWithKill()
      attempt += 1
    }
    assert(last._2, s"no attempt of $attempt produced a disruptive kill " +
      "(failed tasks + post-kill progress) — chaos arm NOT exercised")
    last._1
  }

  test("reliable checkpoint mode survives a SIGKILLed executor mid-CC, rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chaos-ck").toString
    cluster.conf.set(Materialize.DirKey, dir)
    try {
      runWithDisruptiveKill() match {
        case Right(got) => assert(got === expected,
          "survived the kill but produced DIFFERENT rows — corruption, not recovery")
        case Left(e) => fail(
          s"reliable mode must complete through an executor loss; failed: ${e.getMessage}")
      }
    } finally cluster.conf.unset(Materialize.DirKey)
    // replacement executor re-registers before the next arm
    waitFor("replacement executor", 120.seconds)(listener.live >= 2)
  }

  test("localCheckpoint mode under the same kill: loud failure or exact rows, never silent corruption") {
    runWithDisruptiveKill() match {
      case Right(got) =>
        assert(got === expected,
          "survived the kill but produced DIFFERENT rows — silent corruption")
        info("localCheckpoint arm recovered (killed executor held no needed blocks)")
      case Left(e) =>
        info("localCheckpoint arm failed loudly, as Materialize documents " +
          s"for executor loss without a checkpoint dir: ${e.getClass.getSimpleName}")
    }
  }
}
