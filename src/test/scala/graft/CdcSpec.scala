package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking: the operator's two contracts are (1) chunks
  * are a partition of the token stream (lossless reassembly) and (2)
  * boundaries are content-LOCAL, so an edit upstream of a shared passage
  * cannot reshape the passage's chunks — the property fixed-frame chunking
  * lacks and the reason CDC catches shared passages after an insertion.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("chunks partition the token stream: reassembly is lossless, indexes contiguous") {
    val docs = Tables.documents(spark, sf())
    val ch = Dedup.cdcChunks(docs, "doc_id", "text")
    // per doc: chunk token counts sum to the doc's token count, and
    // chunk_idx runs 0..k-1 with no gaps
    val agg = ch.groupBy("doc_id")
      .agg(sum("n_toks").as("sum_toks"), count(lit(1)).as("k"),
           min("chunk_idx").as("i0"), max("chunk_idx").as("i1"))
    val base = docs
      .select($"doc_id", size(graft.operators.TextAnalysis.tokens($"text")).cast("long").as("n"))
      .filter($"n" > 0)
    val joined = agg.join(base, "doc_id")
    assert(joined.filter($"sum_toks" =!= $"n").count() === 0L)
    assert(joined.filter($"i0" =!= 0L || $"i1" =!= $"k" - 1).count() === 0L)
    assert(joined.count() === base.count())
  }

  test("prepend-invariance: every chunk after the first survives a leading insertion") {
    // deterministic 200-token body with varied content (so boundaries occur)
    val body = (1 to 200).map(i => s"w${(i * i) % 97}t$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "junk0 junk1 junk2 junk3 junk4 junk5 junk6 " + body)
    ).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text")
      .select($"doc_id", $"chunk_idx", $"chunk_md5")
      .as[(Long, Long, String)].collect()
    val a = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val b = ch.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSet
    assert(a.length >= 10, s"body produced only ${a.length} chunks — boundary rule degenerate?")
    // boundary windows are 4 tokens, so only the body's first chunk can be
    // reshaped by the 7 junk tokens; chunks 1..k-1 must reappear verbatim
    val tail = a.drop(1)
    assert(tail.forall(b.contains),
      s"${tail.count(!b.contains(_))} of ${tail.length} post-first chunks lost after prepend")
    // the control proving the guard is CDC-specific, not an artifact of the
    // fixture: a fixed 8-token frame chunker shifted by 7 tokens realigns
    // nowhere, so NO frame of the body would survive — here all but one do
    val fixed = (toks: Array[String]) => toks.grouped(8).map(_.mkString(" ")).toSet
    val bodyToks = body.split(" ")
    val shifted = ("junk0 junk1 junk2 junk3 junk4 junk5 junk6 " + body).split(" ")
    assert((fixed(bodyToks) & fixed(shifted)).isEmpty,
      "fixed-frame control unexpectedly survived the shift")
  }

  test("duplicate census finds planted cross-doc shared passages only via chunks") {
    val shared = (1 to 60).map(i => s"s${(i * 7) % 53}q$i").mkString(" ")
    val docs = Seq(
      (1L, "alpha beta gamma " + shared),
      (2L, shared + " delta epsilon"),
      (3L, "unrelated content entirely " + (1 to 40).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val dup = Dedup.cdcChunks(docs, "doc_id", "text")
      .groupBy("chunk_md5")
      .agg(countDistinct($"doc_id").as("n_docs"))
      .filter($"n_docs" >= 2)
    val hits = dup.count()
    assert(hits >= 2, s"only $hits shared chunks found for a 60-token shared passage")
  }
}
