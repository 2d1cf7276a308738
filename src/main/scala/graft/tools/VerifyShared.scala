package graft.tools

import org.apache.spark.sql.SparkSession

/** Verify twin that runs with the BENCH session shape (sharePairs=true,
  * AQE on, 32-way shuffle) and dumps parquet for the oracle compare — the
  * proof that the memoized/shared-frame path is row-identical to the
  * recompute-from-scratch path the official Verify gate checks. Used by
  * the optimization rounds whenever a memo frame's physical layout
  * changes (e.g. Materialize.shared's repartition-before-checkpoint).
  *
  * Usage: VerifyShared <sfDir> <outDir> [q1,q2,...]
  */
object VerifyShared {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).headOption)
    val keep = only.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.withGraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.dedup.sharePairs", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    try graft.queries.DedupQueries.warmupStoredState(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify-shared] warmup failed: ${e.getMessage}") }
    graft.SparkEntry.queries.filter(kv => keep.forall(_(kv._1))).foreach {
      case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify-shared] $name failed: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
