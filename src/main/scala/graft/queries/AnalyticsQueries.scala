package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining analytics surface from SURVEY.md §2b: full ranking-function
  * family with a range frame, exact percentile / variance statistics, and
  * the datetime function kit.
  */
object AnalyticsQueries {

  /** rank / dense_rank / percent_rank + a RANGE frame aggregate. */
  def ranks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"))
    val wr = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 100 === 0) // small deterministic sample
      .select(
        col("o_orderpriority").as("prio"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 4).as("prnk"),
        round(sum("o_totalprice").over(wr), 2).as("range_running"))
      .orderBy("prio", "o_orderkey")
  }

  /** Exact order statistics + spread per priority class. */
  def stats(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("med"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd"),
        round(var_samp(col("o_totalprice")), 4).as("vr"),
        round(avg(col("o_totalprice")), 4).as("av"),
        round(min(col("o_totalprice")), 2).as("mn"),
        round(max(col("o_totalprice")), 2).as("mx"))
      .orderBy("prio")

  /** Bivariate aggregates per return flag: Pearson correlation and sample
    * covariance of quantity vs extended price. Rounded AFTER aggregation:
    * both engines accumulate in different orders, but corr/covar are
    * normalized ratios whose ~1e-14 relative drift vanishes at 4 decimals.
    */
  def corrCovar(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qp_corr"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("qd_covar"),
        count(lit(1)).as("n"))
      .orderBy("flag")

  /** Datetime kit: extract/trunc/diff/add over order dates. */
  def datetime(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 250 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("next_month"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .orderBy("o_orderkey")

  /** Global running revenue total — the unpartitioned-window shape that
    * naively plans as `Exchange SinglePartition` over the whole fact
    * table. Runs through [[graft.operators.PrefixSum]] instead: per-month
    * bucketed windows in parallel, then bucket-total offsets broadcast
    * back, so the only serial scan is over ~tens of month rows. Values in
    * exact integer cents (decimal-quantized) so the two-phase
    * reassociation is bit-equal to the oracle's single window.
    */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.PrefixSum.runningSum(
        o,
        date_trunc("month", col("o_orderdate")),
        Seq(col("o_orderdate"), col("o_orderkey")),
        col("cents"), "running_cents")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("cents"), col("running_cents"))
      .orderBy("od", "o_orderkey")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c5b_rank_family" -> (ranks _),
    "c5c_stats" -> (stats _),
    "c5d_corr" -> (corrCovar _),
    "c7c_datetime" -> (datetime _),
    "c25_running_total" -> (runningTotal _),
  )

  val oracle: Map[String, String] = Map(
    "c25_running_total" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |       OVER (ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS running_cents
        |FROM orders ORDER BY od, o_orderkey""".stripMargin,
    "c5b_rank_family" ->
      """SELECT o_orderpriority AS prio, o_orderkey,
        |  round(o_totalprice, 2) AS price,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  round(percent_rank() OVER w, 4) AS prnk,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS range_running
        |FROM orders WHERE o_orderkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY prio, o_orderkey""".stripMargin,
    "c5c_stats" ->
      """SELECT o_orderpriority AS prio,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS med,
        |  round(stddev_samp(o_totalprice), 4) AS sd,
        |  round(var_samp(o_totalprice), 4) AS vr,
        |  round(avg(o_totalprice), 4) AS av,
        |  round(min(o_totalprice), 2) AS mn,
        |  round(max(o_totalprice), 2) AS mx
        |FROM orders GROUP BY o_orderpriority ORDER BY prio""".stripMargin,
    "c5d_corr" ->
      """SELECT l_returnflag AS flag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
        |  round(covar_samp(l_quantity, l_discount), 4) AS qd_covar,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin,
    "c7c_datetime" ->
      """SELECT o_orderkey,
        |  CAST(extract('year' FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(extract('month' FROM o_orderdate) AS BIGINT) AS mo,
        |  CAST(extract('day' FROM o_orderdate) AS BIGINT) AS dom,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
        |  CAST(extract('quarter' FROM o_orderdate) AS BIGINT) AS qtr
        |FROM orders WHERE o_orderkey % 250 = 0 ORDER BY o_orderkey""".stripMargin,
  )
}
