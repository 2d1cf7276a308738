package graft.tools

import graft.Sessions
import org.apache.spark.sql.SparkSession

/** Focused driver for [[ScaleSmoke.measureSkew]] — iterate on the
  * planted-skew pin in ~2 minutes instead of rerunning the full 10x smoke.
  *
  * Run: SPARK_GRAFT_SKEW_ROWS=20000000 sbt "runMain graft.tools.SkewProbe"
  * The pin `require`s fire on violation; on success the measured numbers
  * print as one line.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withGraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = ScaleSmoke.measureSkew(spark, rows)
    println(f"skew_probe rows=$rows two_path=${r.twoPathSec}%.2fs " +
      f"plain=${r.plainSec}%.2fs straggler_two=${r.twoStraggler}%.2fx " +
      f"straggler_plain=${r.plainStraggler}%.2fx")
    spark.stop()
  }
}
