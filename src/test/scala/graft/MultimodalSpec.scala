package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, deterministic stub decode, narrow resize,
  * frame-sample fan-out. The codec is a stub (no media libs in this env);
  * the Spark-side shapes are the real thing.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaFromText(
    Tables.documents(spark, sf()).limit(50), "doc_id", "text", "image", "docs")

  test("media table carries binary payload + typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.schema("meta").dataType.typeName === "struct")
    val r = m.orderBy("media_id").first()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("stub decode is deterministic and schema-stable") {
    val d1 = Multimodal.decode(media).orderBy("media_id").collect()
    val d2 = Multimodal.decode(media).orderBy("media_id").collect()
    assert(d1 === d2)
    assert(d1.forall(_.getAs[Seq[Double]]("feature").size == 8))
    assert(Multimodal.decode(media).schema === Multimodal.decodedSchema)
  }

  test("resizeMeta bounds the longer side without shuffling") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resizeMeta(decoded, 128)
    val bad = resized.filter(greatest($"out_width", $"out_height") > 128).count()
    assert(bad === 0)
    // narrow: resize adds no exchange beyond what the source already has
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(resized) === exchanges(decoded))
  }

  test("PortableCodec matches its documented md5/byte-moment arithmetic") {
    val payload = "hello graft".getBytes("UTF-8")
    val (w, h, f) = Multimodal.PortableCodec.decode("image", payload)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map(b => f"${b & 0xff}%02x").mkString
    assert(w === 64 + (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 960).toInt)
    assert(h === 64 + (java.lang.Long.parseLong(hex.substring(8, 16), 16) % 960).toInt)
    assert(f.length === 8)
    val expected0 = payload.indices.filter(_ % 8 == 0).map(j => (payload(j) & 0xff).toDouble).sum / payload.length
    assert(f(0) === expected0)
    // mm_decode_meta rides this codec through the real mapPartitions stage
    val out = graft.queries.MultimodalQueries.decodeMeta(spark, sf())
    assert(out.count() === 500)
  }

  test("sampleFrames fans out stride-spaced frame indices for videos") {
    val vids = Multimodal.mediaFromText(
      Tables.documents(spark, sf()).limit(3), "doc_id", "text", "video", "docs")
    val frames = Multimodal.sampleFrames(Multimodal.decode(vids), stride = 5, maxFrames = 4)
    assert(frames.count() === 3 * 4)
    val idx = frames.filter($"media_id" === 0).select("frame_idx")
      .orderBy("frame_idx").as[Int].collect().toSeq
    assert(idx === Seq(0, 5, 10, 15))
  }
}
