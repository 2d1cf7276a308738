package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling contract: exact reproducibility (the property
  * rand()-sampling lacks), salt independence, and fraction accuracy.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("same key+salt+fraction selects the identical row set, any run") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val a = Sampling.deterministic(docs, $"doc_id", 0.2, "x")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministic(docs.repartition(7), $"doc_id", 0.2, "x")
      .select("doc_id").as[Long].collect().toSet
    assert(a === b) // stable under repartition (content-keyed, no RNG)
    assert(a.nonEmpty)
  }

  test("a smaller fraction with the same salt is a subset (nested samples)") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val small = Sampling.deterministic(docs, $"doc_id", 0.05, "x")
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.deterministic(docs, $"doc_id", 0.25, "x")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big)) // thresholds nest on the same hash coordinate
  }

  test("different salts give (near-)independent samples at the right rate") {
    val n = 20000L
    val ids = spark.range(n).toDF("id")
    val a = Sampling.deterministic(ids, $"id", 0.3, "saltA").count()
    val b = Sampling.deterministic(ids, $"id", 0.3, "saltB").count()
    val both = Sampling.deterministic(
      Sampling.deterministic(ids, $"id", 0.3, "saltA"), $"id", 0.3, "saltB").count()
    assert(math.abs(a - n * 0.3) < n * 0.03, s"a=$a")
    assert(math.abs(b - n * 0.3) < n * 0.03, s"b=$b")
    assert(math.abs(both - n * 0.09) < n * 0.02, s"both=$both") // ~independent
  }

  test("stratified drops strata absent from the fraction map") {
    val docs = Tables.documents(spark, sf())
    val out = Sampling.stratified(docs, $"lang", Map("en" -> 1.0), $"doc_id")
    assert(out.select("lang").distinct().as[String].collect().toSeq === Seq("en"))
    // fraction 1.0 keeps every row of the stratum
    assert(out.count() === docs.filter($"lang" === "en").count())
  }
}
