package graft

import graft.tools.ScaleSmoke
import org.apache.spark.sql.functions._

/** Always-on miniature of the sf1 smoke (tools.ScaleSmoke): the replica
  * generator's invariants at sf0.001, so the heavy 10x run can't rot
  * unnoticed between executions.
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  test("replicated corpus: 3x rows, disjoint vocabulary, within-replica pairs only") {
    val base = Tables.documents(spark, sf())
    val rep = ScaleSmoke.replicate(base, 3)
    assert(rep.count() === 3 * base.count())
    // replicas share no tokens at all
    val vocabOverlap = rep
      .select(floor($"doc_id" / ScaleSmoke.Offset).as("r"),
              explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy("tok").agg(countDistinct("r").as("nr"))
      .filter($"nr" > 1).count()
    assert(vocabOverlap === 0L)

    val dir = java.nio.file.Files.createTempDirectory("graft-smoke-mini").toString
    rep.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.queries.DedupQueries.defs("dedup_minhash_pairs")(spark, dir)
    val cross = pairs
      .filter(floor($"doc_a" / ScaleSmoke.Offset) =!= floor($"doc_b" / ScaleSmoke.Offset))
      .count()
    assert(cross === 0L, "cross-replica pair — vocabulary leak")
    val clusters = graft.queries.DedupQueries.defs("dedup_clusters")(spark, dir)
    assert(clusters.count() === 3 * base.count(), "clusters must label every doc")
    // a component never spans replicas
    val span = clusters
      .filter(floor($"doc_id" / ScaleSmoke.Offset) =!= floor($"comp" / ScaleSmoke.Offset))
      .count()
    assert(span === 0L)
  }
}
