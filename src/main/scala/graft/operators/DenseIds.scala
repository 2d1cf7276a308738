package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed contiguous id assignment — the `zipWithIndex` replacement
  * that never leaves Catalyst and never depends on partition order.
  *
  * `monotonically_increasing_id()` leaves gaps and shifts on repartition;
  * `rdd.zipWithIndex` costs an extra job and an RDD round-trip; a global
  * `row_number()` window funnels the table through one task. This instead
  * hashes each key into one of B buckets (portable md5-based hash, so the
  * bijection is a pure function of the KEY SET — stable across runs,
  * retries, partitionings, and engines), numbers rows within a bucket (a
  * window PARTITIONED on the bucket), and adds exclusive per-bucket
  * offsets — a [[PrefixSum]]-style scan whose only serial frame is the
  * B-row bucket-count aggregate.
  *
  * Output ids are exactly 0..N−1 with no gaps: ordered by
  * (bucket, hash, key), which is deterministic but NOT the key order —
  * the contract callers actually need for embedding-matrix rows, bitset
  * positions, or graph node numbering. Same dense-numbering idea as the
  * vocabulary ids inside [[Dedup.bitsetPairStats]], promoted to a public
  * operator with an engine-portable hash.
  */
object DenseIds {

  /** `df` plus column `out` = dense id in [0, N). `key` must be non-null
    * and unique per row (duplicate keys would collide on the same hash
    * rank nondeterministically; the caller owns that invariant).
    */
  def assign(df: DataFrame, key: Column, salt: String = "ids",
             buckets: Int = 1 << 10, out: String = "dense_id"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.withColumn("__did_h", Sampling.hash60(key, salt))
      .withColumn("__did_bk", pmod(col("__did_h"), lit(buckets.toLong)))
    val local = base.withColumn("__did_rn",
      row_number().over(
        Window.partitionBy("__did_bk").orderBy(col("__did_h"), key))
        .cast("long") - 1L)
    // the exclusive prefix over bucket counts is the only serial frame —
    // exactly `buckets` rows; constantPartitionKey silences WindowExec's
    // single-partition WARN without changing the (bounded) plan shape
    val offsets = base.groupBy("__did_bk").agg(count(lit(1)).as("__did_n"))
      .select(col("__did_bk").as("__did_obk"),
        coalesce(
          sum("__did_n").over(
            Window.partitionBy(Dedup.constantPartitionKey(col("__did_bk")))
              .orderBy("__did_bk")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__did_off"))
    local
      .join(broadcast(offsets), local("__did_bk") === offsets("__did_obk"))
      .withColumn(out, col("__did_off") + col("__did_rn"))
      .drop("__did_h", "__did_bk", "__did_rn", "__did_obk", "__did_off")
  }
}
