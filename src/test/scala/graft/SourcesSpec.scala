package graft

import graft.sources.TrendsSource
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source formats beyond parquet (SURVEY.md §2b scans/sources row): csv and
  * json line reads with EXPLICIT schemas (never inferSchema — at 100 TB an
  * inference pass is a full extra scan, and inferred types drift with the
  * data). Every read must round-trip the same rows the parquet source holds.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("json-lines and csv reads with explicit schema round-trip the parquet rows") {
    val dir = Files.createTempDirectory("graft-src").toString
    val src = Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .limit(200)
    src.write.json(s"$dir/j")
    src.write.option("header", "true").csv(s"$dir/c")
    src.write.orc(s"$dir/o")

    val schema = src.schema
    val fromJson = spark.read.schema(schema).json(s"$dir/j")
    val fromCsv = spark.read.schema(schema).option("header", "true").csv(s"$dir/c")
    val fromOrc = spark.read.schema(schema).orc(s"$dir/o")

    val expect = src.orderBy("o_orderkey").collect().toSeq
    assert(fromJson.orderBy("o_orderkey").collect().toSeq === expect)
    assert(fromCsv.orderBy("o_orderkey").collect().toSeq === expect)
    assert(fromOrc.orderBy("o_orderkey").collect().toSeq === expect)
    assert(fromJson.schema === schema && fromCsv.schema === schema &&
           fromOrc.schema === schema)
  }

  test("TrendsSource file-drop replay paths (parquet + csv) yield the wide schema") {
    val dir = Files.createTempDirectory("graft-src-w").toString
    val terms = Seq("vpn", "hack")
    val wide = Seq(("Atlantis", 10L, 20L), ("Oz", 1L, 2L))
      .toDF("country", "vpn", "hack")
    wide.write.parquet(s"$dir/p")
    wide.write.option("header", "true").csv(s"$dir/c")

    val fromP = TrendsSource.fromParquet(spark, s"$dir/p", terms)
    val fromC = TrendsSource.fromCsv(spark, s"$dir/c", terms)
    // file sources force nullable=true regardless of the declared schema,
    // so names+types are the meaningful contract here
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val want = TrendsSource.wideSchema(terms).fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(fromP) === want)
    assert(shape(fromC) === want)
    assert(fromP.orderBy("country").collect().toSeq ===
           fromC.orderBy("country").collect().toSeq)
  }
}
