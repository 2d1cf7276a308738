package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total over a global order).
  *
  * The naive form — `sum(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`
  * with no PARTITION BY — plans as `Exchange SinglePartition` + one
  * `Window` task: every row of a 100 TB table funnels through a single
  * reducer. This operator is the classic two-phase scan instead:
  *
  *   1. bucket each row by a caller-supplied expression that is MONOTONE
  *      non-decreasing in the global sort order (e.g. month of the order
  *      date when sorting by date) — so a bucket is a contiguous slice of
  *      the global order and buckets themselves are totally ordered;
  *   2. per-bucket running sums via a window PARTITIONED by bucket
  *      (parallel across the cluster, no global shuffle to one task);
  *   3. per-bucket totals (one row per bucket — thousands, not billions)
  *      get exclusive running offsets, which broadcast-join back onto the
  *      rows: `running = local_running + offset`.
  *
  * The only single-partition step is the offset scan over the bucket
  * totals, a frame the size of the bucket COUNT — driver-scale by
  * construction, same standing as the sanctioned literal-broadcast
  * pattern. Reassociation caveat: the two-phase sum reorders additions,
  * exact for integer/decimal values (use cents, micronats, …), last-ulp
  * for floats — same contract as [[Skew.saltedSumCount]].
  */
object PrefixSum {

  /** `df` plus column `out` = running sum of `value` over
    * (`bucket` asc, `order` asc). `bucket` MUST be monotone in `order`'s
    * global sort (a coarse prefix of the sort key: day for a timestamp
    * order, id range for an id order); ties across bucket values are
    * resolved by `order` within each bucket exactly as the global window
    * would resolve them, so results match the single-window form row for
    * row whenever (`bucket`, `order`) is a consistent total order.
    */
  def runningSum(df: DataFrame, bucket: Column, order: Seq[Column],
                 value: Column, out: String = "running"): DataFrame = {
    val base = df.withColumn("__psum_bucket", bucket)
      .withColumn("__psum_v", value)
    val wLocal = Window.partitionBy("__psum_bucket")
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__psum_local", sum("__psum_v").over(wLocal))
    // bucket totals: one row per bucket. The exclusive prefix over them is
    // the only unpartitioned window, and it runs on the tiny aggregate.
    val wOffset = Window.orderBy("__psum_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__psum_bucket")
      .agg(sum("__psum_v").as("__psum_btotal"))
      .select(col("__psum_bucket").as("__psum_obucket"),
        sum("__psum_btotal").over(wOffset).as("__psum_offset"))
    local
      .join(broadcast(offsets),
        local("__psum_bucket") === offsets("__psum_obucket"), "left")
      .withColumn(out,
        col("__psum_local") + coalesce(col("__psum_offset"), lit(0)))
      .drop("__psum_bucket", "__psum_v", "__psum_local",
        "__psum_obucket", "__psum_offset")
  }

  /** [[runningSum]] restarted per group: `out` = running sum of `value`
    * over (`bucket` asc, `order` asc) WITHIN each distinct value of the
    * `group` columns — the shape context-window packing needs (one
    * running token sum per language). The naive form —
    * `sum(v) OVER (PARTITION BY group ORDER BY order)` — funnels each
    * group through ONE window task, and a group is not a fine shard: at
    * 100 TB the dominant language of any web corpus is half the data on
    * a single task. Here the row-level window partitions by
    * (group, bucket) — parallel across bucket ranges INSIDE each group —
    * and even the offset scan stays partitioned (one window per group
    * over its bucket totals), so no stage anywhere sees a
    * single-partition exchange.
    *
    * `bucket` MUST be monotone non-decreasing in `order` within each
    * group (a coarse prefix of the per-group sort key: a doc_id range
    * when ordering by doc_id), so a (group, bucket) slice is contiguous
    * in the group's order and local + exclusive-offset = the global
    * per-group running sum, row for row. The offsets relation is one row
    * per (group, bucket) — its size is a caller lever via the bucket
    * width — and rides a broadcast join. Reassociation caveat as
    * [[runningSum]]: exact for integer values.
    */
  def runningSumGrouped(df: DataFrame, group: Seq[String], bucket: Column,
                        order: Seq[Column], value: Column,
                        out: String = "running"): DataFrame = {
    val base = df.withColumn("__psum_bucket", bucket)
      .withColumn("__psum_v", value)
    val wLocal = Window
      .partitionBy((group.map(col) :+ col("__psum_bucket")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__psum_local", sum("__psum_v").over(wLocal))
    // bucket totals per group; the exclusive prefix over them is a window
    // PARTITIONED by the group — it runs on the (group, bucket)-sized
    // aggregate, in parallel across groups
    val wOffset = Window.partitionBy(group.map(col): _*)
      .orderBy("__psum_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base
      .groupBy((group.map(col) :+ col("__psum_bucket")): _*)
      .agg(sum("__psum_v").as("__psum_btotal"))
      .withColumn("__psum_offset", sum("__psum_btotal").over(wOffset))
      .select((group.map(g => col(g).as(s"__psum_g_$g"))
        :+ col("__psum_bucket").as("__psum_obucket")
        :+ col("__psum_offset")): _*)
    val cond = group.map(g => local(g) === offsets(s"__psum_g_$g"))
      .reduce(_ && _) && local("__psum_bucket") === offsets("__psum_obucket")
    local
      .join(broadcast(offsets), cond, "left")
      .withColumn(out,
        col("__psum_local") + coalesce(col("__psum_offset"), lit(0)))
      .drop((Seq("__psum_bucket", "__psum_v", "__psum_local",
        "__psum_obucket", "__psum_offset") ++ group.map(g => s"__psum_g_$g")): _*)
  }
}
