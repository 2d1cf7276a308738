package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Table loaders for the driver testdata (`TESTDATA.md`, schemas in
  * `FIXTURES.md`). Parquet footers carry the authoritative schema, so no
  * inference happens; loaders only normalize physical quirks (the `events.ts`
  * nanosecond column) so query code sees one stable logical schema.
  *
  * At 100 TB these would be partitioned table scans; every query in this
  * library projects/filters early so Catalyst pushes pruning into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet timestamp[ns], which Spark 4 rejects
    * (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong` is
    * on. Read it as raw long nanos and normalize to TimestampType µs
    * (floor division — matches DuckDB's ns value at every granularity the
    * oracle compares at).
    *
    * The flag must be set at session BUILD time (see [[Sessions.withGraftConf]],
    * used by Verify/Bench/the test harness): the scan consults it at
    * execution, so flipping it inside a loader would be a racy global side
    * effect on every other parquet read sharing the session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet carries timestamp[ns]: build the session with " +
        "Sessions.withGraftConf (sets spark.sql.legacy.parquet.nanosAsLong)")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // exact integer FLOOR division: col/1000 would promote to double
        // (256ns ulp at epoch-ns magnitude), and `div` alone truncates
        // toward zero, shifting pre-epoch timestamps up a microsecond
        df.withColumn("ts", timestamp_micros(
          expr("(ts div 1000) - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
