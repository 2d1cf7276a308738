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
}
