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
  * Scale path: [[withBuckets]] implements sign-random-projection LSH using
  * in-data anchor vectors — an equi-join on the bucket id replaces the
  * quadratic cross join, which is the difference between feasible and not at
  * 100 TB. The anchors (a handful of rows) are inlined as literal arrays so
  * bucketing is a shuffle-free projection; only the downstream bucket join
  * shuffles, on a high-cardinality key.
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

  /** Sign-random-projection LSH bucket column: bit i = sign(dot(v, anchor_i)).
    * Anchors come from the data itself (deterministic, oracle-reproducible).
    *
    * The anchors are a handful of rows by construction, so they are
    * collected once to the driver and inlined as literal arrays — the
    * bucket becomes a single narrow projection over the vector column:
    * zero shuffle (no crossJoin fan-out, no groupBy, no join back on
    * vec_id). The per-anchor dot product keeps the exact
    * `aggregate(zip_with(...))` fold the oracle uses, and the bit sum is an
    * integer sum in anchor-id order — bit-identical to the former
    * crossJoin+groupBy form.
    */
  def withBuckets(vecs: DataFrame, anchors: DataFrame): DataFrame = {
    val collected = anchors.select(col("aid").cast("long"), col("av"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    // an empty/degenerate anchor set would silently put EVERY vector in
    // bucket 0 — turning the bucket equi-join into the quadratic self-join
    // LSH exists to avoid. Fail loudly instead of degrading silently.
    require(collected.nonEmpty, "anchor set is empty — no LSH buckets to assign")
    require(collected.forall(_._2 != null), "anchor vectors must be non-null")
    require(collected.forall(_._1 < 63), "anchor ids must fit a long bitmask")
    val bucket = collected
      .map { case (aid, av) =>
        val litAnchor = array(av.map(lit): _*)
        when(dot(col("v"), litAnchor) > 0, lit(1L << aid.toInt)).otherwise(lit(0L))
      }
      .reduce(_ + _)
    vecs.withColumn("bucket", bucket.cast("long"))
  }

  /** (vec_id, bucket) projection of [[withBuckets]] — kept for callers that
    * want the bucket relation alone.
    */
  def bucketize(vecs: DataFrame, anchors: DataFrame): DataFrame =
    withBuckets(vecs, anchors).select("vec_id", "bucket")
}
