package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator`): element-wise centroid of a vector column.
  * Buffer = (running sums, count); merge is element-wise add, so the
  * aggregate is partial-aggregation friendly (map-side combine) like any
  * built-in — no shuffling of raw vectors beyond the partial sums.
  */
class CentroidAgg(dim: Int)
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (sx, nx) = x; val (sy, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    (sx, nx + ny)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
