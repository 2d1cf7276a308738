package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * explicit tool for aggregations where one key dominates (e.g. counting
  * events for one viral user across a 1000-executor cluster). The salted
  * two-phase aggregate spreads a hot key over `salts` partial groups, then
  * combines — identical results to a direct groupBy for exact aggregates
  * (counts, integer/decimal sums); floating-point sums may differ in the
  * last ulp because the two-phase plan reassociates the additions. The cost
  * is one extra (tiny) shuffle over the partials.
  *
  * Salts are computed from row CONTENT (`pmod(hash(cols...), salts)`), never
  * from `monotonically_increasing_id()`/`rand()` — a nondeterministic salt
  * recomputed differently on task retry would rely on Spark's
  * indeterminate-stage rollback instead of being correct by construction.
  * The default salts over every column, which spreads a hot key as long as
  * its rows differ somewhere; if the hot key's rows are fully identical,
  * pass `saltOn` naming a stable unique id (and note that fully-identical
  * rows are exact-dedup's job anyway).
  */
object Skew {

  // hash() rejects MapType at ANY nesting depth, so the default-salt
  // exclusion must look inside arrays/structs, not just top-level types
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType      => true
      case ArrayType(e, _) => containsMap(e)
      case StructType(fs)  => fs.exists(f => containsMap(f.dataType))
      case _               => false
    }
  }

  private def contentSalt(df: DataFrame, saltOn: Seq[Column], salts: Int): Column = {
    val cols =
      if (saltOn.nonEmpty) saltOn
      else df.schema.fields.collect {
        case f if !containsMap(f.dataType) => col(f.name)
      }.toSeq
    require(cols.nonEmpty,
      "no hashable columns to salt on — pass saltOn explicitly")
    pmod(hash(cols: _*), lit(salts))
  }

  /** Two-phase salted sum/count aggregate over possibly-skewed keys.
    * Output: (keyCols..., n, total) — equal to the direct
    * `groupBy(key).agg(count, sum(valueCol))` (see the float caveat above).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 32, saltOn: Seq[Column] = Nil): DataFrame = {
    val partial = df
      .withColumn("__salt", contentSalt(df, saltOn, salts))
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
                 salts: Int = 8, saltOn: Seq[Column] = Nil): DataFrame = {
    val saltedFact = fact.withColumn("__salt", contentSalt(fact, saltOn, salts))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** HOT-KEY-SCOPED two-path salted equi-join (the `c24_salted_join`
    * shape, factored): a blanket [[saltedJoin]] replicates the WHOLE dim
    * `salts`× — at 100 TB that multiplies the dominant shuffle by the salt
    * factor to fix a handful of keys. This form pays replication only
    * where skew lives:
    *
    *  1. census the fact side for keys with ≥ `hotMinRows` rows — a
    *     key-grain aggregate, broadcast (hot keys are FEW by definition;
    *     a million hot keys is a repartition problem, not a salt problem);
    *  2. HOT slice: salt fact rows (deterministic content salt via
    *     `saltOn`), explode ONLY the hot dim rows `salts`×, join on
    *     (key, salt) — the one hot reducer becomes `salts` even ones;
    *  3. COLD tier: plain equi-join, untouched;
    *  4. union — row-identical to the plain join (ScaleOpsSpec pins the
    *     two-path plan, ScaleSmoke measures the balance on a planted-skew
    *     fixture).
    *
    * `dim` must be unique per key (a dimension); output columns = fact ++
    * dim columns minus the dim's join key.
    */
  def hotScopedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, hotMinRows: Long, salts: Int,
                    saltOn: Column): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val hot = broadcast(
      fact.groupBy(factKey).agg(count(lit(1)).as("__f"))
        .filter(col("__f") >= hotMinRows)
        .select(col(factKey).as("__hk")))
    val factHot = fact.join(hot, col(factKey) === col("__hk"), "left_semi")
      .withColumn("__salt", pmod(saltOn.cast("long"), lit(salts.toLong)))
    val factCold = fact.join(hot, col(factKey) === col("__hk"), "left_anti")
    val dimHot = dim.join(hot, col(dimKey) === col("__hk"), "left_semi")
      .withColumn("__dsalt",
        explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    val hotSide = factHot
      .join(dimHot.hint("merge"),
        col(factKey) === col(dimKey) && col("__salt") === col("__dsalt"))
      .drop("__salt", "__dsalt", dimKey)
    val coldSide = factCold.join(dim.hint("merge"), col(factKey) === col(dimKey))
      .drop(dimKey)
    hotSide.unionByName(coldSide)
  }
}
