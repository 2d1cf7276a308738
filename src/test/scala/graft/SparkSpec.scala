package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session("graft-test")

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

/** THE test-session construction — every suite and property object must go
  * through this: all suites share one per-JVM session, so a divergent
  * builder anywhere rewrites session conf for whoever initializes second.
  */
object SparkSpec {
  def session(appName: String): SparkSession =
    Sessions.withGraftConf(SparkSession.builder()
      .master("local[4]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
}
