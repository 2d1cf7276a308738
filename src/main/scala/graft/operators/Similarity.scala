package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `Array[Double]` embedding columns.
  *
  * The arithmetic is a strict left-to-right fold (`aggregate(zip_with(...))`)
  * so the DuckDB oracle (`list_sum(list_transform(...))`) produces bit-equal
  * doubles; outputs are rounded to 4 decimals *before* ranking so orderings
  * never depend on sub-ulp differences.
  *
  * Scale path: [[bucketize]] implements sign-random-projection LSH using
  * in-data anchor vectors — an equi-join on the bucket id replaces the
  * quadratic cross join, which is the difference between feasible and not at
  * 100 TB. The anchors are broadcast (tiny), the bucket join shuffles on a
  * high-cardinality key.
  */
object Similarity {

  /** Sequential dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm (sequential fold, same order as the oracle). */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Composed-fold cosine (no session registration needed). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine (bit-identical to [[cosine]]; requires
    * graft.functions.VectorFunctions.register on the session).
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Embeddings normalized to (vec_id, v: array<double>, label). */
  def prepared(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))

  /** Brute-force top-k neighbours for each query vector (broadcast the small
    * query side, rank by rounded cosine with vec_id tie-break).
    */
  def bruteForceTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val sims = vecs.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
              round(cosineNative(col("v"), col("qv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Sign-random-projection LSH bucket id: bit i = sign(dot(v, anchor_i)).
    * Anchors come from the data itself (deterministic, oracle-reproducible).
    * Returns (vec_id, bucket).
    */
  def bucketize(vecs: DataFrame, anchors: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(anchors))
      .withColumn("bitw",
        when(dot(col("v"), col("av")) > 0,
             expr("shiftleft(CAST(1 AS BIGINT), CAST(aid AS INT))"))
          .otherwise(lit(0L)))
      .groupBy("vec_id")
      .agg(sum("bitw").as("bucket"))
}
