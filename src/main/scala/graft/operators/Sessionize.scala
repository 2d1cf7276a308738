package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign a session id per key from event-time gaps.
  * A new session starts when the gap to the previous event exceeds
  * `gapSeconds`. This is the batch twin of Structured Streaming's
  * `session_window` (see graft.streaming.Streams); both are covered by the
  * C10 equivalence test.
  *
  * Plan shape: one shuffle on `keyCol` (the window partition), then two
  * window passes over the same partitioning — Spark reuses the sort, so this
  * stays a single exchange at any scale.
  */
object Sessionize {
  def apply(df: DataFrame, keyCol: String, tsCol: String,
            gapSeconds: Long, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(asc(tsCol), asc(tieBreak))
    val sec = col(tsCol).cast("long")
    df.withColumn("__prev", lag(sec, 1).over(w))
      .withColumn("__new_sess",
        when(col("__prev").isNull || sec - col("__prev") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .drop("__prev", "__new_sess")
  }
}
