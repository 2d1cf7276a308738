package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` within the same key.
  *
  * Implemented with the union + running-max trick instead of an inequality
  * join: tag both inputs, sort within key by (ts, tag) so right-side rows at
  * an equal timestamp precede left rows, and carry the latest right value
  * forward with a running aggregate. One shuffle on the key, no quadratic
  * pair space, no range-join explosion — this is the form that survives
  * 100 TB, and it degrades gracefully under key skew (AQE splits the
  * oversized partitions; the window itself is a linear scan).
  */
object AsOfJoin {

  /** Returns the left rows with an extra column `asof_<valueCol>` holding the
    * latest right `valueCol` at or before the left row's time (null if none).
    *
    * @param left     probe side; must contain keyCol, tsCol
    * @param right    reference side; must contain keyCol, tsCol, valueCol
    */
  def lastValue(left: DataFrame, right: DataFrame,
                keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__tag", lit(0))
      .withColumnRenamed(valueCol, "__val")
    val unioned = l.select((leftCols.map(col).toIndexedSeq :+ col("__tag") :+ col("__val")): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows (__tag 0) sort before left rows at equal ts => "<=" semantics;
    // __val as the final key makes right-right timestamp ties deterministic
    // (the max value wins)
    val w = Window.partitionBy(keyCol).orderBy(asc(tsCol), asc("__tag"), asc("__val"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__val")
  }

  /** Backward as-of with a TOLERANCE (pandas `merge_asof(tolerance=...)`):
    * like [[lastValue]], but the match is discarded — asof value NULL —
    * when the latest right row is more than `toleranceSec` seconds older
    * than the left row. The window additionally carries the matched right
    * row's timestamp (conditioned on a non-null value so the (ts, value)
    * pair can never desynchronize under null right values); the tolerance
    * check is exact timestamp INTERVAL arithmetic, no epoch-second
    * truncation. Same one-shuffle union + running-aggregate scale shape.
    */
  def lastValueWithin(left: DataFrame, right: DataFrame,
                      keyCol: String, tsCol: String, valueCol: String,
                      toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, s"tolerance must be non-negative, got $toleranceSec")
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__tag", lit(0))
      .withColumnRenamed(valueCol, "__val")
    val unioned = l.select((leftCols.map(col).toIndexedSeq :+ col("__tag") :+ col("__val")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(asc(tsCol), asc("__tag"), asc("__val"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__mval", last(col("__val"), ignoreNulls = true).over(w))
      .withColumn("__mts",
        last(when(col("__tag") === 0 && col("__val").isNotNull, col(tsCol)),
          ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      // NULL __mts (no match at all) falls through the when to NULL
      .withColumn(s"asof_$valueCol",
        when(col("__mts") >= col(tsCol) - expr(s"INTERVAL $toleranceSec SECOND"),
          col("__mval")))
      .drop("__tag", "__val", "__mval", "__mts")
  }

  /** The FORWARD direction (pandas `merge_asof(direction='forward')`): the
    * earliest right `valueCol` at or after the left row's time (null if
    * none). Same union + running-aggregate shape, mirrored: right rows sort
    * AFTER left rows at an equal timestamp would break ">=", so the tag
    * order flips and the window looks ahead; right-right ties resolve to
    * the MIN value for a total, engine-independent order.
    */
  def nextValue(left: DataFrame, right: DataFrame,
                keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(0))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__tag", lit(1))
      .withColumnRenamed(valueCol, "__val")
    val unioned = l.select((leftCols.map(col).toIndexedSeq :+ col("__tag") :+ col("__val")): _*)
      .unionByName(r, allowMissingColumns = true)
    // left rows (__tag 0) sort before right rows at equal ts, and the frame
    // starts at CURRENT ROW => a right row at the same ts is visible (">=")
    val w = Window.partitionBy(keyCol).orderBy(asc(tsCol), asc("__tag"), asc("__val"))
      .rowsBetween(0, Window.unboundedFollowing)
    unioned
      .withColumn(s"asof_$valueCol", first(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .drop("__tag", "__val")
  }
}
