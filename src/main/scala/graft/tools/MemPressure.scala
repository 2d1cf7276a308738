package graft.tools

import graft.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Memory-pressure pin at 10× scale: every other scale argument in this
  * repo is wall-time; this one is about DEGRADING GRACEFULLY. The
  * heaviest families (near-dup clustering, the rolling-state epoch merge,
  * the IVF index build) run on the full-table 10× replica under a
  * deliberately SMALL heap (SPARK_DRIVER_MEM=4g vs the comfortable 24 GiB
  * the smoke uses — local mode, so this bounds executor memory too), and
  * the pin is: every workload COMPLETES, with the pressure proven real by
  * task-metric spill bytes > 0. Completion-with-spill is the difference
  * between "fits in this box's RAM" and the actual 100 TB question —
  * whether the operators fall back to disk under pressure instead of
  * OOMing, which is what Spark's unified memory manager + sort-based
  * shuffle are supposed to buy and what this probe measures instead of
  * assumes.
  *
  * The probe runs ONE EXECUTOR'S SHAPE: 8 cores on the 4 GiB heap
  * (512 MB/core — the realistic dense-executor ratio), not the box's 32
  * threads. 32 tasks sharing ~2.2 GiB of unified execution memory is
  * 70 MB/task — tighter than any sane cluster config — and measured
  * UNABLE_TO_ACQUIRE_MEMORY aborts there: concurrent sorters each pinned
  * below their spill granularity, which is an over-subscription failure,
  * not an operator one. The cores knob is the same one a real deployment
  * turns (spark.executor.cores), so the probe documents the supported
  * envelope instead of a fantasy one.
  *
  * Run: SPARK_DRIVER_MEM=4g SPARK_GRAFT_MEM_DIR=/tmp/graft-10x \
  *        sbt "runMain graft.tools.MemPressure"
  * Writes mem_pressure.json; if scale_smoke.json exists, merges its keys
  * into that artifact's JSON object (the smoke and this probe ride
  * different heaps, so they are separate invocations of one evidence
  * file). Requirements fire on violation: zero spill means the heap was
  * not actually small enough for the data and the pin would be vacuous.
  */
object MemPressure {

  private final class SpillListener extends SparkListener {
    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    val peakExecMem = new AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        peakExecMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_MEM_DIR"))
      .getOrElse("/tmp/graft-10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.withGraftConf(SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-mem-pressure")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // 1. near-dup clustering of the 10x corpus (pair generation + bitset
    //    verify + CC star contraction — the widest shuffles in the repo)
    val (tClusters, nClusters) = timed(
      graft.queries.DedupQueries.clusters(spark, dir).count())

    // 2. rolling-state epoch advance: standing state over replicas 0..8,
    //    then merge replica 9 (bucketed writes + cross-probe joins)
    val docs = graft.Tables.documents(spark, dir)
    val cut = 9L * ScaleSmoke.Offset
    val n = graft.operators.DedupState.names("graft_memp", dir)
    val (tBuild, _) = timed {
      graft.queries.DedupQueries.buildFullState(
        spark, docs.filter(org.apache.spark.sql.functions.col("doc_id") < cut), n)
      0L
    }
    val (tMerge, _) = timed {
      graft.queries.DedupQueries.mergeEpoch(
        spark, docs.filter(org.apache.spark.sql.functions.col("doc_id") >= cut), n)
      0L
    }

    // 3. IVF index build + two-level assignment over the 10x embeddings
    val (tIvf, nIvf) = timed(
      graft.queries.SimilarityQueries.defs("sim_ivf_twolevel")(spark, dir).count())

    val spillMem = listener.memSpilled.get()
    val spillDisk = listener.diskSpilled.get()
    require(nClusters > 0L && nIvf > 0L, "workloads returned no rows")
    require(spillMem + spillDisk > 0L,
      s"no spill under a ${heapMb}MB heap — the pressure pin is vacuous; " +
        "lower SPARK_DRIVER_MEM or raise the replica size")

    val json =
      f"""{"metric":"mem_pressure","dir":"$dir","heap_mb":$heapMb,"spill_mem_bytes":$spillMem,"spill_disk_bytes":$spillDisk,"peak_exec_mem_bytes":${listener.peakExecMem.get()},"clusters_sec":$tClusters%.2f,"clusters":$nClusters,"state_build_sec":$tBuild%.2f,"merge_sec":$tMerge%.2f,"ivf_sec":$tIvf%.2f,"ivf_rows":$nIvf}"""
    // SPARK_GRAFT_MEM_OUT redirects the artifact — the N× scale ladder
    // (10× vs 30× under the same executor shape) runs this probe once per
    // replica dir with distinct outputs and adjudicates the ratios
    val outName = sys.env.getOrElse("SPARK_GRAFT_MEM_OUT", "mem_pressure.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outName),
      (json + "\n").getBytes("UTF-8"))
    // fold the evidence into scale_smoke.json's object when present —
    // only for the DEFAULT (10×) artifact; a ladder run must not
    // overwrite the smoke's mem_* keys with another scale's numbers
    val smoke = java.nio.file.Paths.get("scale_smoke.json")
    if (outName == "mem_pressure.json" && java.nio.file.Files.exists(smoke)) {
      val raw = new String(java.nio.file.Files.readAllBytes(smoke), "UTF-8").trim
      // idempotent merge: strip any mem_* keys a previous run appended so
      // re-running never produces duplicate JSON keys in the artifact
      val cur = raw.replaceAll(""","mem_[A-Za-z0-9_]+":[^,}]+""", "")
      if (cur.endsWith("}")) {
        val merged = cur.dropRight(1) +
          f""","mem_heap_mb":$heapMb,"mem_spill_mem_bytes":$spillMem,"mem_spill_disk_bytes":$spillDisk,"mem_clusters_sec":$tClusters%.2f,"mem_state_build_sec":$tBuild%.2f,"mem_merge_sec":$tMerge%.2f,"mem_ivf_sec":$tIvf%.2f}"""
        java.nio.file.Files.write(smoke, (merged + "\n").getBytes("UTF-8"))
      }
    }
    spark.stop()
    println(json)
  }
}
