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

  test("malformed json rows surface as nulls (PERMISSIVE) or are droppable (DROPMALFORMED)") {
    // at 100 TB some rows WILL be garbage; a poison line must not kill the
    // scan, and the two recovery policies must behave as declared
    val dir = Files.createTempDirectory("graft-badjson").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part.json"),
      java.util.Arrays.asList(
        """{"k": 1, "v": "ok"}""",
        """{"k": not-json at all""",
        """{"k": 3, "v": "also ok"}"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val permissive = spark.read.schema(schema).json(dir)
    assert(permissive.count() === 3)
    assert(permissive.filter($"k".isNull).count() === 1) // poison row nulled, scan alive
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 2)
    assert(dropped.filter($"k".isNull).count() === 0)
  }

  test("observe: pipeline-embedded metrics ride the existing scan (O20 debug)") {
    // df.observe collects named aggregates DURING the job — no second scan,
    // no collect of data rows: the production way to watch row counts /
    // null rates at 100 TB (vs a debug .count() that doubles the read)
    val obs = new org.apache.spark.sql.Observation("orders_stats")
    val df = Tables.orders(spark, sf())
      .observe(obs, count(lit(1)).as("n"),
               sum(when($"o_totalprice" <= 0, 1L).otherwise(0L)).as("bad_price"))
      .filter($"o_orderstatus" === "O")
    val filtered = df.count()
    val m = obs.get
    assert(m("n") === 1500L, m)          // observed BEFORE the filter
    assert(m("bad_price") === 0L, m)
    assert(filtered < 1500L)
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
