package graft

import graft.operators.OrderStats
import org.apache.spark.sql.functions._

/** Exact-selection contract: values match a sorted reference at every
  * probed rank, and NO stage sorts more than `sortCap` rows even when the
  * distribution piles most of the relation onto one value — the
  * heavy-ties degeneracy the round-7 review flagged for the histogram
  * median (a 90%-tie column used to funnel ~n rows through the one
  * candidate-bin ranking window).
  */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ref(xs: Seq[Long], r: Long): Long = xs.sorted.apply((r - 1).toInt)

  test("selected ranks equal the sorted reference on mixed data") {
    val xs = (1 to 5000).map(i => ((i * 2654435761L) % 100000L) - 50000L)
    val df = xs.toDF("v").repartition(7).localCheckpoint(true)
    val ranks = Seq(1L, 2L, 1250L, 2500L, 2501L, 4999L, 5000L)
    val (got, _) = OrderStats.selectRanks(df, ranks)
    ranks.foreach(r => assert(got(r) === ref(xs.map(identity), r), s"rank $r"))
  }

  test("90%-tie column: correct values, no sort ever exceeds the cap") {
    // 90% of the relation is one value sitting ON the median — the
    // degenerate case where one histogram bin holds ~n rows
    val xs = Seq.fill(9000)(77L) ++ (1 to 500).map(i => i.toLong) ++
      (1 to 500).map(i => 1000000L + i)
    val df = xs.toDF("v").repartition(7).localCheckpoint(true)
    val n = xs.length.toLong
    val ranks = Seq((n + 1) / 2, n / 2 + 1, (n + 3) / 4, (3 * n + 3) / 4)
    val (got, stats) = OrderStats.selectRanks(df, ranks.distinct, sortCap = 64)
    ranks.foreach(r => assert(got(r) === ref(xs, r), s"rank $r"))
    // the tie value resolves by RANGE COLLAPSE (lo == hi), never by
    // sorting the tie run; only sub-cap remnants may touch a window
    assert(stats.maxSorted <= 64, stats.toString)
    assert(stats.levels <= 10, stats.toString)
  }

  test("all-constant column resolves without any sort") {
    val df = Seq.fill(2000)(42L).toDF("v").localCheckpoint(true)
    val (got, stats) = OrderStats.selectRanks(df, Seq(1L, 1000L, 2000L), sortCap = 16)
    assert(got.values.toSet === Set(42L))
    assert(stats.maxSorted === 0L, stats.toString)
  }

  test("grouped selection: per-group medians match sorted references, tie-heavy group included") {
    val xs = Seq.fill(3000)(("a", 7L)) ++ (1 to 500).map(i => ("a", i.toLong)) ++
      (1 to 700).map(i => ("b", (i * 3 - 900).toLong)) ++ Seq(("c", 42L))
    val df = xs.toDF("g", "v").repartition(7).localCheckpoint(true)
    val res = OrderStats.selectRanksGrouped(df,
      (_, n) => Seq((n + 1) / 2, n / 2 + 1).distinct, sortCap = 64)
    Seq("a", "b", "c").foreach { g =>
      val vs = xs.filter(_._1 == g).map(_._2).sorted
      val n = vs.length.toLong
      val (gotN, vals) = res(g)
      assert(gotN === n, s"group $g count")
      assert(vals((n + 1) / 2) === vs(((n + 1) / 2 - 1).toInt), s"group $g k1")
      assert(vals(n / 2 + 1) === vs((n / 2).toInt), s"group $g k2")
    }
  }

  test("medianScalable output is consistent with the exact sorted median") {
    import graft.queries.MiscQueries
    val out = MiscQueries.medianScalable(spark, sf()).head()
    val v = Tables.lineitem(spark, sf()).select(
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .as[Long].collect().sorted
    val n = v.length.toLong
    val mid =
      if (n % 2 == 1) v(((n + 1) / 2 - 1).toInt)
      else v((n / 2 - 1).toInt) + v((n / 2).toInt)
    assert(out.getLong(0) === n)
    assert(out.getLong(1) === mid)
  }

  // naive reference for the weighted budget cut: descending sort,
  // inclusive running weight, the first crossing row's value + the exact
  // weight strictly above it
  private def refWeighted(xs: Seq[(Long, Long)], budget: Long): (Long, Long) = {
    val sorted = xs.sortBy { case (v, _) => (-v, 0L) }
    var cum = 0L
    val t = sorted.find { case (_, w) => cum += w; cum > budget }
      .map(_._1).getOrElse(xs.map(_._1).min)
    (t, xs.filter(_._1 > t).map(_._2).sum)
  }

  test("weighted descending selection matches the sorted reference") {
    val xs = (1 to 4000).map { i =>
      (((i * 2654435761L) % 997L) - 498L, (i * 40503L) % 37L + 1L)
    }
    val df = xs.toDF("v", "w").repartition(7).localCheckpoint(true)
    val total = xs.map(_._2).sum
    for (budget <- Seq(0L, 1L, total / 10, total / 3, total - 1, total, total + 50)) {
      val (t, above, _) = OrderStats.selectWeightedDesc(df, budget)
      val (rt, rAbove) = refWeighted(xs, budget)
      assert(t === rt, s"budget $budget threshold")
      assert(above === rAbove, s"budget $budget above-weight")
      // the caller contract: everything above t fits, adding the full tie
      // run would overflow (unless the whole relation fits the budget)
      assert(above <= budget)
      val withTies = above + xs.filter(_._1 == t).map(_._2).sum
      if (budget < total) assert(withTies > budget)
    }
  }

  test("weighted selection: 90%-tie weight mass never exceeds the sort cap") {
    val xs = Seq.fill(9000)((77L, 5L)) ++ (1 to 500).map(i => (i.toLong, 3L)) ++
      (1 to 500).map(i => (1000000L + i, 2L))
    val df = xs.toDF("v", "w").repartition(7).localCheckpoint(true)
    val total = xs.map(_._2).sum
    val budget = total / 2 // lands inside the 9000-row tie run at 77
    val (t, above, stats) = OrderStats.selectWeightedDesc(df, budget, sortCap = 64)
    val (rt, rAbove) = refWeighted(xs, budget)
    assert(t === rt && above === rAbove)
    assert(t === 77L) // the crossing really is inside the tie
    assert(stats.maxSorted <= 64, stats.toString)
  }
}
