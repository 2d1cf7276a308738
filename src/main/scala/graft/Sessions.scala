package graft

import org.apache.spark.sql.SparkSession

/** Session-construction conventions shared by every entry point (Verify,
  * Bench, TrendsJob, the test harness). These are settings that must be in
  * place before the first query is planned — flipping them mid-session from
  * inside a loader would be a global side effect racing against every other
  * query on the same session.
  */
object Sessions {
  def withGraftConf(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries parquet timestamp[ns], which Spark 4 only
      // reads as raw longs under this legacy flag; Tables.events converts
      // the longs to µs timestamps explicitly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog tables (DedupState's bucketed corpus state) go to a
      // per-process temp warehouse: entry points stay hermetic and never
      // litter the working directory with spark-warehouse/
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
}
