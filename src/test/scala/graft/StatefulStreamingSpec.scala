package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Engine-test surface that is not oracle-checkable (SURVEY.md §2c tail):
  * approx_count_distinct accuracy, and custom state via
  * flatMapGroupsWithState (running per-user event counter).
  */
class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct tracks exact distinct within rsd") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val (exact, approx) = ev
      .agg(countDistinct("user_id").cast("double"),
           approx_count_distinct("user_id", 0.05).cast("double"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.15)
  }

  test("flatMapGroupsWithState keeps running per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val counted = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          Iterator((user, total))
      }.toDF("user_id", "running_total")
    val q = counted.writeStream.format("memory")
      .queryName("fmgs").outputMode("append").start()
    try {
      def t(min: Long) = new Timestamp(1704067200000L + min * 60000L)
      mem.addData(Seq(Ev(0, t(0), 1, "view", 1.0), Ev(1, t(1), 1, "view", 1.0),
                      Ev(2, t(2), 2, "view", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(3, t(3), 1, "click", 1.0)))
      q.processAllAvailable()
      val rows = spark.table("fmgs")
        .groupBy("user_id").agg(max("running_total").as("m"))
        .as[(Long, Long)].collect().toMap
      assert(rows(1L) === 3L) // state carried across the two batches
      assert(rows(2L) === 1L)
    } finally q.stop()
  }
}
