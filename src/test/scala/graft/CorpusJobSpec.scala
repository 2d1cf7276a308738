package graft

import graft.pipeline.CorpusJob
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the funnel only narrows, the output is
  * decontaminated and deduplicated, splits partition it, and a re-run is
  * byte-idempotent.
  */
class CorpusJobSpec extends SparkSpec {
  import spark.implicits._

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft-corpus").toString
  private lazy val cfg =
    CorpusJob.Config(input = sf("sf0.001"), out = outDir)
  private lazy val result = CorpusJob.execute(spark, cfg)

  test("funnel narrows monotonically and ends non-empty") {
    val (_, f) = result
    assert(f.input >= f.exactKept)
    assert(f.exactKept >= f.nearKept)
    assert(f.nearKept >= f.cleanKept)
    assert(f.cleanKept >= f.qualityKept)
    assert(f.qualityKept > 0, "curation must not empty the corpus")
    assert(f.perSplit.values.sum === f.qualityKept,
      "splits must partition the curated corpus exactly")
  }

  test("output carries no exact duplicates and no eval contamination") {
    val (out, _) = result
    assert(out.select(md5($"text")).distinct().count() === out.count(),
      "exact duplicates survived")
    val evalHashes = Tables.documents(spark, cfg.input)
      .filter($"doc_id" % 10 === 0).select(md5($"text").as("h"))
    val contaminated = out.select(md5($"text").as("h")).join(evalHashes, "h").count()
    assert(contaminated === 0L, s"$contaminated eval-contaminated docs survived")
    // eval docs themselves are excluded from the training corpus
    assert(out.filter($"doc_id" % 10 === 0).count() === 0L)
  }

  test("near-dup clusters keep exactly one representative") {
    val (out, _) = result
    // recompute simhash pairs over the OUTPUT: any surviving pair at
    // Hamming <= 3 would mean a cluster kept two members
    val sh = graft.operators.Dedup.simhash(out, "doc_id", "text")
    val x = sh.select($"doc_id".as("a"), $"simhash".as("ha"))
    val y = sh.select($"doc_id".as("b"), $"simhash".as("hb"))
    val survivors = x.join(y, $"a" < $"b")
      .filter(bit_count($"ha".bitwiseXOR($"hb")) <= 3).count()
    assert(survivors === 0L, s"$survivors near-dup pairs survived curation")
  }

  test("re-running the job is byte-idempotent (static overwrite of the corpus)") {
    val (out, _) = result
    val first = out.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val (again, f2) = CorpusJob.execute(spark, cfg)
    assert(again.orderBy("doc_id").collect().map(_.toSeq).toSeq === first)
    assert(f2.perSplit === result._2.perSplit)
  }

  test("config parsing validates and round-trips") {
    val c = CorpusJob.parse(Array("--input", "/in", "--out", "/out",
      "--min-tokens", "5", "--min-distinct-ratio", "0.5", "--salt", "v2"))
    assert(c === CorpusJob.Config("/in", "/out", 5, 0.5, "v2"))
    intercept[IllegalArgumentException] { CorpusJob.parse(Array("--bogus", "x")) }
    intercept[IllegalArgumentException] { CorpusJob.parse(Array("--input", "/in")) }
  }
}
