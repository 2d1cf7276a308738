package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics of a long column by iterative distributed
  * histogram SELECTION — the scalable replacement for both the global sort
  * and the value-buffering exact `percentile` aggregate, generalized from
  * the median query so quartile/decile cuts share one implementation.
  *
  * Each level: one map-side-combined pass builds a `bins`-bin INTEGER
  * histogram of the candidate range (bin = ((v−lo)·B) div (hi−lo+1) —
  * exact arithmetic, no float binning to diverge), the ≤`bins`-row
  * histogram collects to the driver, cumulative counts locate each target
  * rank's bin, and the bin's value range becomes the next level's
  * candidate range with the rank offset advanced. A range collapses when
  * it narrows to ONE value (every remaining rank IS that value — the
  * heavy-ties case: a 90%-tie column isolates the tie value in ≤
  * log_B(width) levels without ever sorting it) or when its row count
  * fits under `sortCap`, where a bounded single-partition ranking window
  * finishes the job. No stage anywhere sorts more than `sortCap` rows, so
  * a degenerate distribution can never funnel the relation through one
  * sort task (OrderStatsSpec pins exactly that with a 90%-tie fixture).
  *
  * The driver holds only histograms (≤ `bins` rows per level) and the
  * range bookkeeping — the sanctioned bounded-collect pattern. Levels are
  * ≤ ceil(log_B(initial width)) + 1; the convergence `require` allows the
  * full signed-64-bit width.
  *
  * Caveat: `(hi − lo + 1) · bins` must stay in long range — values within
  * ±2^52 (any cents/micronat column) are safe with the default 1024 bins.
  */
object OrderStats {

  /** Selection diagnostics: levels run and the largest row count any
    * ranking-window sort actually received (≤ sortCap by construction).
    */
  final case class Stats(levels: Int, maxSorted: Long)

  /** Exact values of the 1-based `ranks` of column `v` in `values`
    * (callers materialize `values` — every level re-reads it). Returns
    * (rank → value, diagnostics).
    */
  def selectRanks(values: DataFrame, ranks: Seq[Long], bins: Int = 1024,
                  sortCap: Long = 1L << 17): (Map[Long, Long], Stats) = {
    val (_, m, st) = selectRanksOf(values, _ => ranks, bins, sortCap)
    (m, st)
  }

  /** [[selectRanks]] with the ranks DERIVED from the relation's row count
    * (quantile ranks like ceil(q·n) need n first): the bounds pass counts
    * anyway, so this saves callers a separate `count()` job. Returns
    * (n, rank → value, diagnostics).
    */
  def selectRanksOf(values: DataFrame, ranksOf: Long => Seq[Long],
                    bins: Int = 1024,
                    sortCap: Long = 1L << 17): (Long, Map[Long, Long], Stats) = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val v = values.select(col("v"))
    val b0 = v.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n")).head()
    require(!b0.isNullAt(0), "selectRanks over an empty relation")
    val (lo0, hi0, n) = (b0.getLong(0), b0.getLong(1), b0.getLong(2))
    val ranks = ranksOf(n)
    require(ranks.nonEmpty, "selectRanks needs at least one rank")
    ranks.foreach(r => require(r >= 1 && r <= n,
      s"rank $r outside [1, $n]"))
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

    var resolved = Map.empty[Long, Long]
    // open ranges: (lo, hi, rank offset of rows below the range, row
    // count) → the target ranks inside. Ranges from one level partition
    // the value space, so keys never collide.
    var open: Map[(Long, Long, Long, Long), Seq[Long]] =
      Map((lo0, hi0, 0L, n) -> ranks.distinct)
    var levels = 0
    var maxSorted = 0L
    while (open.nonEmpty) {
      levels += 1
      require(levels <= 10,
        s"order-statistic selection failed to converge: $open")
      open = open.toSeq.flatMap { case ((lo, hi, off, cnt), rs) =>
        if (lo == hi) {
          rs.foreach(r => resolved += r -> lo)
          Seq.empty
        } else if (cnt <= sortCap) {
          // bounded finish: rank within the ranged rows via ONE window
          // whose input is ≤ sortCap rows by construction
          maxSorted = math.max(maxSorted, cnt)
          val rows = v.filter(col("v").between(lo, hi))
            .withColumn("rn",
              row_number().over(Window.orderBy("v")).cast("long") + lit(off))
            .filter(col("rn").isInCollection(rs))
            .select("rn", "v").collect()
          rows.foreach(r => resolved += r.getLong(0) -> r.getLong(1))
          Seq.empty
        } else {
          val w = hi - lo + 1
          require(w > 0 && w <= Long.MaxValue / bins,
            s"range width $w of [$lo, $hi] overflows the exact $bins-bin " +
              "integer binning — values must span <= Long.MaxValue / bins")
          val hist = v.filter(col("v").between(lo, hi))
            .select(expr(s"((v - $lo) * $bins) div $w").as("bin"))
            .groupBy("bin").agg(count(lit(1)).as("c"))
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .sortBy(_._1)
          var cum = 0L
          val cumBelow = hist.map { case (b, c) =>
            val t = (b, c, cum); cum += c; t
          }
          rs.groupBy { r =>
            cumBelow.find(t => t._3 < r - off && r - off <= t._3 + t._2)
              .getOrElse(sys.error(s"rank ${r - off} outside histogram of $cnt rows"))
          }.map { case ((b, c, cb), rr) =>
            // bin b covers v−lo in [ceil(b·w/B), ceil((b+1)·w/B) − 1] —
            // the exact preimage of the integer binning rule
            val nlo = lo + ceilDiv(b * w, bins)
            val nhi = lo + ceilDiv((b + 1) * w, bins) - 1
            ((nlo, nhi, off + cb, c), rr)
          }.toSeq
        }
      }.toMap
    }
    (n, resolved, Stats(levels, maxSorted))
  }

  /** Per-GROUP exact order statistics, all groups advancing together:
    * `values` carries (g: string, v: long); `ranksOf(g, n_g)` names each
    * group's 1-based target ranks. Each level costs ONE filtered scan +
    * ONE (g, range, bin) aggregate *regardless of group count* — k groups
    * pay the same passes as one, which is what makes an exact per-group
    * median affordable where k separate selections would schedule k× the
    * jobs. Same guarantees as [[selectRanks]]: ranges collapse on a
    * single value or finish under a bounded per-group ranking window, so
    * no stage sorts more than `sortCap` rows of any one group. Driver
    * bookkeeping is O(groups × open ranges) — the operator is for
    * LOW-cardinality group keys (event types, languages), the
    * grouped-scalar profile shape; group count is asserted against
    * `maxGroups` so a high-cardinality key fails loudly instead of
    * flooding the driver.
    *
    * Returns group → (row count, rank → value).
    */
  def selectRanksGrouped(values: DataFrame,
                         ranksOf: (String, Long) => Seq[Long],
                         bins: Int = 1024, sortCap: Long = 1L << 17,
                         maxGroups: Int = 1000): Map[String, (Long, Map[Long, Long])] = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val v = values.select(col("g").cast("string").as("g"), col("v"))
    val b0 = v.groupBy("g").agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n")).collect()
    require(b0.nonEmpty, "selectRanksGrouped over an empty relation")
    require(b0.length <= maxGroups,
      s"${b0.length} groups exceed maxGroups=$maxGroups — this operator is " +
        "for low-cardinality group keys")
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
    val counts = b0.map(r => r.getString(0) -> r.getLong(3)).toMap
    var resolved = Map.empty[(String, Long), Long]
    // open ranges keyed by (group, range id): rid keeps a group's
    // multiple disjoint ranges separable inside the one batched pass
    var nextRid = 0L
    var open: Map[(String, Long), (Long, Long, Long, Long, Seq[Long])] =
      b0.map { r =>
        val (g, lo, hi, n) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val ranks = ranksOf(g, n).distinct
        ranks.foreach(k => require(k >= 1 && k <= n,
          s"rank $k outside [1, $n] for group $g"))
        nextRid += 1
        (g, nextRid) -> (lo, hi, 0L, n, ranks)
      }.toMap
    var levels = 0
    while (open.nonEmpty) {
      levels += 1
      require(levels <= 10,
        s"grouped order-statistic selection failed to converge: ${open.keys}")
      // 0) collapsed ranges resolve for free
      val (done, live) = open.partition { case (_, (lo, hi, _, _, _)) => lo == hi }
      done.foreach { case ((g, _), (lo, _, _, _, ranks)) =>
        ranks.foreach(k => resolved += (g, k) -> lo)
      }
      import values.sparkSession.implicits._
      // 1) small ranges finish in ONE batched ranking pass: rows join the
      // range relation on g, window partitions by (g, rid) — each
      // partition is <= sortCap rows by construction
      val (small, big) = live.partition { case (_, (_, _, _, cnt, _)) => cnt <= sortCap }
      if (small.nonEmpty) {
        val rdf = small.toSeq.map { case ((g, rid), (lo, hi, off, _, _)) =>
          (g, rid, lo, hi, off)
        }.toDF("g", "__rid", "__lo", "__hi", "__off")
        val tdf = small.toSeq.flatMap { case ((g, rid), (_, _, _, _, ranks)) =>
          ranks.map(k => (g, rid, k))
        }.toDF("__tg", "__trid", "__k")
        val w = Window.partitionBy("g", "__rid").orderBy("v")
        v.join(broadcast(rdf), Seq("g"))
          .filter(col("v").between(col("__lo"), col("__hi")))
          .withColumn("__rn", row_number().over(w).cast("long") + col("__off"))
          .join(broadcast(tdf), col("g") === col("__tg") &&
            col("__rid") === col("__trid") && col("__rn") === col("__k"))
          .select(col("g"), col("__k"), col("v"))
          .collect()
          .foreach(r => resolved += (r.getString(0), r.getLong(1)) -> r.getLong(2))
      }
      // 2) big ranges histogram in ONE batched (g, rid, bin) aggregate
      open =
        if (big.isEmpty) Map.empty
        else {
          big.foreach { case ((g, _), (lo, hi, _, _, _)) =>
            val w = hi - lo + 1
            require(w > 0 && w <= Long.MaxValue / bins,
              s"range width $w of [$lo, $hi] (group $g) overflows the exact " +
                s"$bins-bin integer binning — values must span <= Long.MaxValue / bins")
          }
          val rdf = big.toSeq.map { case ((g, rid), (lo, hi, _, _, _)) =>
            (g, rid, lo, hi)
          }.toDF("g", "__rid", "__lo", "__hi")
          val hist = v.join(broadcast(rdf), Seq("g"))
            .filter(col("v").between(col("__lo"), col("__hi")))
            .select(col("g"), col("__rid"),
              expr(s"((v - __lo) * $bins) div (__hi - __lo + 1)").as("__bin"))
            .groupBy("g", "__rid", "__bin").agg(count(lit(1)).as("__c"))
            .collect()
            .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
            .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sortBy(_._1) }
          big.toSeq.flatMap { case (key @ (g, _), (lo, hi, off, cnt, ranks)) =>
            val w = hi - lo + 1
            var cum = 0L
            val cumBelow = hist(key).map { case (b, c) =>
              val t = (b, c, cum); cum += c; t
            }
            ranks.groupBy { k =>
              cumBelow.find(t => t._3 < k - off && k - off <= t._3 + t._2)
                .getOrElse(sys.error(s"rank ${k - off} outside histogram of $cnt rows ($g)"))
            }.map { case ((b, c, cb), rr) =>
              nextRid += 1
              (g, nextRid) -> (lo + ceilDiv(b * w, bins),
                lo + ceilDiv((b + 1) * w, bins) - 1, off + cb, c, rr)
            }
          }.toMap
        }
    }
    b0.map { r =>
      val g = r.getString(0)
      g -> (counts(g), resolved.collect { case ((`g`, k), value) => k -> value })
    }.toMap
  }

  /** WEIGHTED descending selection — the budget-cut primitive: over rows
    * (v: long, w: long ≥ 0), find the value `t` of the first row whose
    * INCLUSIVE cumulative weight in (v DESC) order exceeds `budget`
    * (ties share one v, so the crossing row's value is order-free), and
    * `above` = the total weight of rows with v strictly greater than t.
    * A caller then keeps every row above t plus a deterministic prefix of
    * the ties at t up to `budget − above` — exactly the "highest-quality
    * docs until the token budget" cut, located by the same histogram
    * machinery as [[selectRanks]] (per level: one map-side-combined
    * (bin → Σw, count) aggregate, driver scans ≤ `bins` rows from the top)
    * instead of the global sort + running-sum window the naive form pays.
    * If the whole relation fits the budget, t is the minimum value.
    * Returns (t, above, diagnostics).
    */
  def selectWeightedDesc(values: DataFrame, budget: Long, bins: Int = 1024,
                         sortCap: Long = 1L << 17): (Long, Long, Stats) = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    require(budget >= 0, s"budget=$budget must be >= 0")
    val v = values.select(col("v"), col("w"))
    val b0 = v.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n"), sum("w").as("tw")).head()
    require(!b0.isNullAt(0), "selectWeightedDesc over an empty relation")
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
    // All-zero weight: every cumulative sum is 0 ≤ budget, so nothing ever
    // crosses — the whole relation fits and t is the minimum value (the
    // descending scan would otherwise see 0 > −1 at the TOP bin and
    // misreport the maximum).
    if (b0.getLong(3) == 0L) return (b0.getLong(0), 0L, Stats(0, 0L))
    // (lo, hi, row count in range, weight strictly above hi, budget left)
    var range = (b0.getLong(0), b0.getLong(1), b0.getLong(2), 0L,
      math.min(budget, b0.getLong(3) - 1)) // total ≤ budget ⇒ crossing at min
    var levels = 0
    var maxSorted = 0L
    while (range._1 != range._2 && range._3 > sortCap) {
      levels += 1
      require(levels <= 10,
        s"weighted selection failed to converge: $range")
      val (lo, hi, _, above, left) = range
      val width = hi - lo + 1
      require(width > 0 && width <= Long.MaxValue / bins,
        s"range width $width of [$lo, $hi] overflows the exact $bins-bin " +
          "integer binning — values must span <= Long.MaxValue / bins")
      val hist = v.filter(col("v").between(lo, hi))
        .select(expr(s"((v - $lo) * $bins) div $width").as("bin"), col("w"))
        .groupBy("bin").agg(sum("w").as("bw"), count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(-_._1) // descending scan from the top bin
      var acc = 0L
      val crossed = hist.find { case (_, bw, _) =>
        val hit = acc + bw > left; if (!hit) acc += bw; hit
      }.getOrElse(sys.error(
        s"budget $left not crossed inside range [$lo, $hi] of weight " +
          s"${hist.map(_._2).sum} — bounds pass disagrees with histogram"))
      val (b, _, c) = crossed
      range = (lo + ceilDiv(b * width, bins),
        lo + ceilDiv((b + 1) * width, bins) - 1, c, above + acc, left - acc)
    }
    val (lo, hi, cnt, above, left) = range
    if (lo == hi) (lo, above, Stats(levels, maxSorted))
    else {
      // bounded finish: the crossing row via ONE ≤ sortCap-row window
      maxSorted = cnt
      val cum = Window.orderBy(desc("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = v.filter(col("v").between(lo, hi))
        .withColumn("__cum", sum("w").over(cum))
        .filter(col("__cum") > left)
        .agg(max("v").as("t")).head().getLong(0)
      val aboveT = v.filter(col("v").between(lo, hi) && col("v") > t)
        .agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
      (t, above + aboveT, Stats(levels, maxSorted))
    }
  }
}
