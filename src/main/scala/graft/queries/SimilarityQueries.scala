package graft.queries

import graft.Tables
import graft.operators.Similarity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C13 + similarity-search extension suite over `embeddings`: brute-force
  * cosine top-k (baseline) and sign-LSH bucketed ANN (the scale path — the
  * bucket equi-join replaces the quadratic cross join).
  */
object SimilarityQueries {

  /** Shared DuckDB fragment: cosine of two DOUBLE[] columns, sequential sum
    * order identical to Spark's aggregate(zip_with(...)) fold.
    */
  private def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]))
       | / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |    * sqrt(list_sum(list_transform($b, x -> x*x))))""".stripMargin

  /** C13 — brute-force cosine similarity to vector 0, top-10. */
  def c13(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val vecs = prepared(Tables.embeddings(s, d))
    val target = vecs.filter(col("vec_id") === 0).select(col("v").as("tv"))
    vecs.crossJoin(broadcast(target))
      .select(col("vec_id"), round(cosineNative(col("v"), col("tv")), 4).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Brute-force k-NN join: top-5 neighbours for each of 10 query vectors. */
  def knn(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val vecs = prepared(Tables.embeddings(s, d))
    val queries = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    bruteForceTopK(vecs, queries, 5)
      .select("qid", "vec_id", "sim", "rnk")
      .orderBy("qid", "rnk")
  }

  /** LSH-bucketed ANN: sign-projection buckets from 8 in-data anchors, then
    * top-3 per query within its bucket only.
    */
  def lshAnn(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val vecs = prepared(Tables.embeddings(s, d))
    val anchors = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("aid"), col("v").as("av"))
    val eb = withBuckets(vecs, anchors)
    val q = eb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
    val sims = eb.join(q, "bucket")
      .select(col("qid"), col("vec_id"), col("bucket"),
              round(cosineNative(col("v"), col("qv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select("qid", "vec_id", "bucket", "sim", "rnk")
      .orderBy("qid", "rnk")
  }

  /** IVF-style ANN: a coarse quantizer assigns every vector to the Voronoi
    * cell of its nearest seed (the first 10 in-data vectors — deterministic,
    * oracle-reproducible), then each query probes ONLY its own cell. The
    * sibling scale path to [[lshAnn]]: cells partition the corpus (good
    * recall for clustered data), hyperplane buckets hash it (no training).
    * At 100 TB the cell assignment is one broadcast crossJoin against the
    * tiny seed set + one shuffle on vec_id; search shuffles on the cell id.
    */
  def ivfAnn(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val vecs = prepared(Tables.embeddings(s, d))
    val seeds = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("sid"), col("v").as("sv"))
    val scored = vecs.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("v"), col("sid"),
              round(cosineNative(col("v"), col("sv")), 4).as("cs"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("cs"), asc("sid"))
    val assigned = scored.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("sid").as("cell"))
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell"))
    val sims = assigned.join(q, "cell")
      .select(col("qid"), col("vec_id"), col("cell"),
              round(cosineNative(col("v"), col("qv")), 4).as("sim"))
    val wTop = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rnk", row_number().over(wTop)).filter(col("rnk") <= 3)
      .select("qid", "vec_id", "cell", "sim", "rnk")
      .orderBy("qid", "rnk")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c13_cosine_topk" -> (c13 _),
    "sim_knn" -> (knn _),
    "sim_lsh_ann" -> (lshAnn _),
    "sim_ivf_ann" -> (ivfAnn _),
  )

  val oracle: Map[String, String] = Map(
    "c13_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |t AS (SELECT v AS tv FROM e WHERE vec_id = 0),
         |p AS (SELECT e.vec_id, round(${duckCos("e.v", "t.tv")}, 4) AS sim FROM e, t)
         |SELECT vec_id, sim FROM p ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "sim_knn" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |p AS (SELECT q.qid, e.vec_id, round(${duckCos("e.v", "q.qv")}, 4) AS sim FROM e, q)
         |SELECT qid, vec_id, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rnk
         |FROM p QUALIFY rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "sim_ivf_ann" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (SELECT vec_id AS sid, v AS sv FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT e.vec_id, e.v, s.sid, round(${duckCos("e.v", "s.sv")}, 4) AS cs
         |  FROM e, s),
         |asg AS (
         |  SELECT vec_id, v, sid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, sid ASC) AS rn
         |    FROM scored) t WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv, cell FROM asg WHERE vec_id < 10),
         |p AS (
         |  SELECT q.qid, a.vec_id, a.cell, round(${duckCos("a.v", "q.qv")}, 4) AS sim
         |  FROM asg a JOIN q USING (cell))
         |SELECT qid, vec_id, cell, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rnk
         |FROM p QUALIFY rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "sim_lsh_ann" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |a AS (SELECT vec_id AS aid, v AS av FROM e WHERE vec_id < 8),
         |bk AS (
         |  SELECT e.vec_id, CAST(sum(
         |    CASE WHEN list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * a.av[i])) > 0
         |         THEN (CAST(1 AS BIGINT) << CAST(a.aid AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e, a GROUP BY e.vec_id),
         |eb AS (SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)),
         |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM eb WHERE vec_id < 10),
         |p AS (
         |  SELECT q.qid, eb.vec_id, eb.bucket, round(${duckCos("eb.v", "q.qv")}, 4) AS sim
         |  FROM eb JOIN q USING (bucket))
         |SELECT qid, vec_id, bucket, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rnk
         |FROM p QUALIFY rnk <= 3 ORDER BY qid, rnk""".stripMargin,
  )
}
