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

  test("profile_quantiles approx twin stays inside the sketch envelope at bench scale") {
    // the swap SURVEY §8 asserts for 100 TB, tested instead of claimed:
    // the approx twin runs the IDENTICAL query shape at sf0.1 and every
    // per-group quantile must land inside the exact percentiles at
    // q ± 2/accuracy (the GK rank guarantee mapped to value space), with
    // 1e-4 slack for the 4dp output rounding both twins apply
    val d = sf("sf0.1")
    val acc = 10000
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val lo = qs.map(q => math.max(0.0, q - 2.0 / acc))
    val hi = qs.map(q => math.min(1.0, q + 2.0 / acc))
    val env = Tables.orders(spark, d).groupBy("o_orderstatus")
      .agg(expr(s"percentile(o_totalprice, array(${lo.mkString("D, ")}D))").as("lo"),
           expr(s"percentile(o_totalprice, array(${hi.mkString("D, ")}D))").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    val approx = queries.MiscQueries.profileQuantilesApprox(spark, d, acc).collect()
    val exact = queries.MiscQueries.profileQuantiles(spark, d).collect()
    assert(approx.map(_.getString(0)).toSeq === exact.map(_.getString(0)).toSeq)
    assert(approx.map(_.getLong(1)).toSeq === exact.map(_.getLong(1)).toSeq,
      "the twins must aggregate the same groups and counts — shape identity")
    approx.foreach { r =>
      val (l, h) = env(r.getString(0))
      qs.indices.foreach { i =>
        val v = r.getDouble(2 + i)
        assert(v >= l(i) - 1e-4 && v <= h(i) + 1e-4,
          s"group=${r.getString(0)} q=${qs(i)} approx=$v outside [${l(i)}, ${h(i)}]")
      }
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
