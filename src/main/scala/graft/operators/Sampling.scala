package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is nondeterministic across runs, task retries,
  * and repartitions — a 100 TB data-mixing job needs the SAME sample every
  * time it (or its backfill) runs. Here membership is a pure function of a
  * key column: row kept iff the top 60 bits of md5(salt:key) fall below
  * `fraction` of the hash space. Reproducible everywhere (md5 is
  * engine-portable, so the DuckDB oracle recomputes membership exactly),
  * stable under any partitioning, and different salts give independent
  * samples (e.g. disjoint train/holdout from salts + complementary ranges).
  *
  * All comparisons stay in integer space (hash60 < floor(fraction·2^60)) —
  * no float thresholds to drift between engines.
  */
object Sampling {

  private val HashSpace = 1L << 60

  /** Uniform 60-bit hash of (salt, key) — the sampling coordinate.
    * Callers must exclude NULL keys first: concat_ws silently skips NULLs,
    * which would hash every null-key row to the one constant md5(salt) —
    * all-or-nothing membership, not Bernoulli (and divergent from SQL
    * engines whose '||' nulls out). [[deterministic]]/[[stratified]] drop
    * null-key rows for exactly this reason.
    */
  def hash60(key: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Integer threshold for a fraction of the 60-bit hash space. */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    math.min((fraction * HashSpace.toDouble).toLong, HashSpace)
  }

  /** Deterministic Bernoulli(fraction) sample keyed on `key`; null-key
    * rows are dropped (see [[hash60]]).
    */
  def deterministic(df: DataFrame, key: Column, fraction: Double,
                    salt: String = ""): DataFrame =
    df.filter(key.isNotNull && hash60(key, salt) < lit(threshold(fraction)))

  /** Stratified deterministic sample: per-stratum fractions; strata absent
    * from the map are dropped (fraction 0).
    */
  def stratified(df: DataFrame, strata: Column, fractions: Map[String, Double],
                 key: Column, salt: String = ""): DataFrame = {
    val thresholds = map(fractions.toSeq.flatMap {
      case (k, f) => Seq(lit(k), lit(threshold(f)))
    }: _*)
    df.filter(key.isNotNull && hash60(key, salt) <
      coalesce(try_element_at(thresholds, strata), lit(0L)))
  }

  /** Deterministic multi-way split: PARTITION the hash space into
    * consecutive ranges, one per named split, and label each row with the
    * range its hash falls in. Unlike independent Bernoulli samples, the
    * splits are disjoint and exhaustive BY CONSTRUCTION — the
    * train/val/test assignment a data-mixing job must hold stable across
    * reruns, backfills, and engines. Weights must sum to 1 (±1 ulp is
    * rejected: an uncovered sliver of hash space would silently drop rows).
    * Null-key rows are dropped (see [[hash60]]).
    */
  def splitAssign(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                  salt: String = "", splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0.0),
      s"every split weight must be positive, got ${splits.map(_._2).mkString(", ")}")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val h = hash60(key, salt)
    // the LAST split is the unconditional otherwise-branch: cumulative float
    // error in its upper bound can never leave a row unassigned
    val labeled = splitBounds(splits).init.reverse.foldLeft(lit(splits.last._1)) {
      case (acc, (name, bound)) => when(h < lit(bound), lit(name)).otherwise(acc)
    }
    df.filter(key.isNotNull).withColumn(splitCol, labeled)
  }

  /** Cumulative hash-space upper bounds for [[splitAssign]]'s ranges — the
    * oracle needs the SAME integer thresholds the Spark plan compares at.
    */
  def splitBounds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // cumulative float error can carry the last bound an ulp past 1.0
    // (weights that sum to 1 within splitAssign's 1e-9 gate still do this);
    // clamp so threshold's domain check can't reject a legitimate split set
    splits.map(_._1).zip(bounds.map(b => threshold(math.min(b, 1.0))))
  }

  /** Efraimidis–Spirakis priority for WEIGHTED sampling without
    * replacement: rank rows by `ln(u) / w` (u uniform on (0,1] from the
    * deterministic 60-bit hash, w the row's weight) and keep the top-k —
    * each row's inclusion probability is proportional to its weight, the
    * standard A-ES scheme. The log form needs ONE elementary function per
    * row (vs two roundings for u^(1/w)) and orders identically; u is
    * `(hash60+1)/2^60`, the +1 applied in INTEGER space before the cast so
    * both engines round the same value once (u=0 is excluded, so ln is
    * total). Weight must be strictly positive — callers filter first.
    */
  def esPriority(key: Column, weight: Column, salt: String = ""): Column =
    log((hash60(key, salt) + lit(1L)).cast("double") / lit(HashSpace.toDouble)) /
      weight.cast("double")

  /** The hash-space size as the double both engines divide by. */
  def hashSpaceDouble: Double = HashSpace.toDouble

  /** Deterministic standard-Gumbel draw for `key` under `salt`:
    * g = −ln(−ln(u)) with u = (2·hash60+1)/2^61 — the MIDPOINT of the
    * hash's cell, so u is strictly inside (0,1) for every hash value and
    * both ln calls are total in both engines (u = 1 would make DuckDB's
    * ln(0) raise; [[esPriority]]'s +1 construction admits it at
    * hash = 2^60−1). 2h+1 is computed in INTEGER space; its one cast to
    * double rounds identically everywhere (IEEE round-to-nearest), so
    * the draw is bit-reproducible across runs/retries/engines. The
    * Gumbel-max trick turns "sample ∝ exp(score)" into "top-k by
    * score + g" — one narrow pass, no global resample.
    */
  def gumbel(key: Column, salt: String = ""): Column =
    -log(-log((hash60(key, salt) * lit(2L) + lit(1L)).cast("double")
      / lit(2.0 * HashSpace.toDouble)))

  /** Deterministic EXACT-SIZE sample: the k rows per group with the
    * smallest hash — a fixed per-source budget ("give me exactly 40 docs
    * per language, the same 40 every run"). Hash order is uniform, so this
    * is a uniform sample without replacement; `key` breaks hash ties so
    * the choice is total even under collisions.
    */
  def topKByHash(df: DataFrame, group: Column, key: Column, k: Int,
                 salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(group).orderBy(hash60(key, salt), key)
    df.filter(key.isNotNull)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Poisson(1) CDF thresholds in the 60-bit hash space, one per
    * multiplicity 0..6 (mass beyond 7 is ~8e-8 and truncates to 7).
    * Exact integer literals computed ONCE here and injected into both the
    * Spark plan and the oracle SQL, so no float boundary can diverge.
    */
  private[graft] val Poisson1Thresholds: Seq[Long] = {
    val pmf = (1 to 6).scanLeft(math.exp(-1.0))((p, k) => p / k)
    val cdf = pmf.scanLeft(0.0)(_ + _).tail
    cdf.map(c => math.min((c * HashSpace.toDouble).toLong, HashSpace))
  }

  /** Deterministic Poisson(1) bootstrap multiplicity for `key` under
    * `salt` (one salt per bootstrap replicate). The Poisson bootstrap is
    * THE bootstrap that scales: classical resampling draws n rows WITH
    * replacement from a global sample — impossible without materializing
    * the resample — while multinomial(n, 1/n) counts converge to
    * independent Poisson(1) multiplicities, so each row computes its own
    * weight from a portable hash: no shuffle, no RNG state, identical on
    * every run/engine/retry. Aggregating with these as weights yields one
    * bootstrap replicate; R salts give R replicates for variance/CI
    * estimation in a single pass.
    */
  def poissonMultiplicity(key: Column, salt: String): Column = {
    val h = hash60(key, salt)
    Poisson1Thresholds.zipWithIndex.foldRight(
        lit(Poisson1Thresholds.size.toLong): Column) {
      case ((t, i), acc) => when(h < t, lit(i.toLong)).otherwise(acc)
    }
  }

  /** The same multiplicity rule as DuckDB SQL over `keyExpr`, using the
    * identical integer thresholds.
    */
  def poissonMultiplicitySql(keyExpr: String, salt: String): String = {
    val h = s"CAST('0x' || substring(md5('$salt:' || CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT)"
    val whens = Poisson1Thresholds.zipWithIndex
      .map { case (t, i) => s"WHEN $h < $t THEN $i" }.mkString(" ")
    s"CASE $whens ELSE ${Poisson1Thresholds.size} END"
  }
}
