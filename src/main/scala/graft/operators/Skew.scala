package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * explicit tool for aggregations where one key dominates (e.g. counting
  * events for one viral user across a 1000-executor cluster). The salted
  * two-phase aggregate spreads a hot key over `salts` partial groups, then
  * combines — identical results to a direct groupBy for any decomposable
  * aggregate, at the cost of one extra (tiny) shuffle over the partials.
  */
object Skew {

  /** Two-phase salted sum/count aggregate over possibly-skewed keys.
    * Output: (keyCols..., n, total) — equal to the direct
    * `groupBy(key).agg(count, sum(valueCol))`.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 32): DataFrame = {
    val salt = pmod(hash(col(valueCol), monotonically_increasing_id()), lit(salts))
    val partial = df
      .withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as("total"))
  }

  /** Salted broadcast-replicated join for a skewed fact side: replicate each
    * (small) dimension row `salts` times and salt the fact rows, so one hot
    * key spreads across `salts` reducers. Equi-join results are identical.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
