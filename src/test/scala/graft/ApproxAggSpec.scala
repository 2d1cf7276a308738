package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate treatment (same policy as HLL/CMS: approximate
  * results are ENGINE-tested against their published error bounds, never
  * oracle queries — two engines' sketches legitimately differ).
  * percentile_approx is Spark's mergeable quantile summary; at 100 TB it is
  * the distribution-shape primitive (doc-length/score percentiles) where an
  * exact sort-based percentile would be a full-data shuffle.
  */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("percentile_approx tracks exact percentiles within the accuracy bound") {
    val prices = Tables.orders(spark, sf("sf0.01")).select($"o_totalprice")
    val acc = 1000 // relative rank error <= 1/acc
    val n = prices.count()
    for (q <- Seq(0.25, 0.5, 0.9, 0.99)) {
      val exact = prices
        .select(expr(s"percentile(o_totalprice, $q)")).as[Double].head()
      val approx = prices
        .select(expr(s"percentile_approx(o_totalprice, $q, $acc)")).as[Double].head()
      // convert the rank-error guarantee into a value-space check: the
      // approx answer must sit between the exact percentiles at q +- 2/acc
      val lo = prices.select(expr(
        s"percentile(o_totalprice, ${math.max(0.0, q - 2.0 / acc)})")).as[Double].head()
      val hi = prices.select(expr(
        s"percentile(o_totalprice, ${math.min(1.0, q + 2.0 / acc)})")).as[Double].head()
      assert(approx >= lo && approx <= hi,
        s"q=$q approx=$approx outside [$lo, $hi] (exact=$exact, n=$n)")
    }
  }

  test("percentile_approx is deterministic across repeated runs") {
    val df = Tables.orders(spark, sf("sf0.01"))
    def run() = df.groupBy("o_orderpriority")
      .agg(expr("percentile_approx(o_totalprice, 0.5, 100)").as("m"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(run() === run())
  }
}
