package graft

import graft.operators.DenseIds
import org.apache.spark.sql.functions._

/** The dense-id operator's contract: exact bijection onto 0..N−1, stable
  * under repartitioning, and never serialized through one task.
  */
class DenseIdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are exactly 0..N-1 with no gaps or duplicates") {
    val docs = Tables.documents(spark, sf("sf0.01")).select("doc_id")
    val ids = DenseIds.assign(docs, $"doc_id")
      .select("dense_id").as[Long].collect().sorted
    assert(ids.toSeq === (0L until ids.length).toSeq)
  }

  test("the bijection is a pure function of the key set: repartition-stable") {
    val docs = Tables.documents(spark, sf("sf0.01")).select("doc_id")
    val a = DenseIds.assign(docs, $"doc_id")
      .select("doc_id", "dense_id").as[(Long, Long)].collect().toMap
    val b = DenseIds.assign(docs.repartition(7), $"doc_id")
      .select("doc_id", "dense_id").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("row-level numbering runs bucket-partitioned; only the bucket-count frame is serial") {
    val df = DenseIds.assign(
      Tables.documents(spark, sf("sf0.01")).select("doc_id"), $"doc_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the row-level window partitions on the bucket (partition attr
    // precedes the order spec inside windowspecdefinition)
    assert("windowspecdefinition\\(__did_bk#\\d+L, __did_h#\\d+L".r
      .findFirstIn(plan).isDefined, plan)
    // no raw-table SinglePartition shuffle: the serial frame sits above
    // the per-bucket aggregate only
    assert(!"Exchange SinglePartition[^\\n]*\\n[^\\n]*(?:Project|ColumnarToRow|FileScan)".r
      .findFirstIn(plan).isDefined, plan)
  }
}
