package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity relational building blocks.
  *
  * Each mirrors one operator cluster of the reference pipeline
  * (`/root/reference/dags/google_trends_to_bigquery.py`, see SURVEY.md §2a)
  * re-expressed as lazy Catalyst plans:
  *
  *  - [[melt]]         — O4 unpivot (`df.melt`, ref :53)
  *  - [[cohortFilter]] — O9–O11 groupby-nunique + HAVING + semi-join
  *    (ref :76-85). The reference collects the qualifying keys to the driver
  *    and re-filters with `isin`; here it is a `left_semi` join that Catalyst
  *    turns into a broadcast join when the qualifying side is small — no
  *    driver round-trip, scales to arbitrarily many keys.
  *  - [[rankWithin]]   — O12–O16 CASE-derived sort key + partitioned
  *    `rank(method='first')` (ref :100-110), which is exactly `row_number()`
  *    over the full sort order.
  */
object ReferenceOps {

  /** Wide → long unpivot (reference `melt`, ref :53). Value columns must share
    * a common type (Spark casts to the least common type).
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String, valueName: String): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valueName)

  /** Keep rows whose `keyCol` belongs to a qualifying cohort: group by
    * `groupCols`, keep groups where `count(distinct distinctExpr) < threshold`
    * (ref :76-79), then left-semi join the input back on `keyCol` (ref :82-85,
    * minus the driver-side collect).
    */
  def cohortFilter(df: DataFrame, groupCols: Seq[String], distinctExpr: Column,
                   threshold: Long, keyCol: String,
                   keepBelow: Boolean = true): DataFrame = {
    val n = countDistinct(distinctExpr)
    val pred = if (keepBelow) n < threshold else n >= threshold
    val qualifying = df.groupBy(groupCols.map(col): _*)
      .agg(pred.as("__keep"))
      .filter(col("__keep"))
      .select(keyCol).distinct()
    df.join(qualifying, Seq(keyCol), "left_semi")
  }

  /** Partitioned ranking with an explicit total tie-break order
    * (ref :100-110). `orderSpec` must be total within each partition so the
    * result is deterministic — the pandas `rank(method='first')` semantics.
    */
  def rankWithin(df: DataFrame, partitionCols: Seq[String],
                 orderSpec: Seq[Column], as: String = "ranking"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderSpec: _*)
    df.withColumn(as, row_number().over(w))
  }
}
