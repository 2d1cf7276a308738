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

  test("frameFeatures samples payload frames and computes exact byte means") {
    // 40-byte payload, 16-byte frames -> 2 full frames (tail 8 bytes dropped);
    // stride 1 samples both
    val bytes = Array.tabulate(40)(i => (i + 1).toByte)
    val m = Seq((7L, bytes)).toDF("media_id", "payload")
    val rows = Multimodal.frameFeatures(m, frameBytes = 16, stride = 1)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1))
    assert(rows.forall(_.getAs[Long]("n_frames") == 2L))
    assert(rows(0).getAs[Double]("f_mean") === (1 to 16).sum / 16.0)
    assert(rows(1).getAs[Double]("f_mean") === (17 to 32).sum / 16.0)
    // stride 2 keeps only frame 0; sub-frame payloads emit nothing
    assert(Multimodal.frameFeatures(m, 16, 2).collect().map(_.getInt(1)).toSeq === Seq(0))
    val tiny = Seq((8L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    assert(Multimodal.frameFeatures(tiny, 16, 1).isEmpty)
    // null payload is an empty blob, not a crash
    val nul = Seq((9L, null: Array[Byte])).toDF("media_id", "payload")
    assert(Multimodal.frameFeatures(nul, 16, 1).isEmpty)
  }

  test("ImageIoCodec decodes real PNG bytes: true dimensions + pixel features") {
    // deterministic PNGs of known sizes, through the real mapPartitions stage
    val fixtures = Seq((1L, 5, 3, 42L), (2L, 17, 9, 7L), (3L, 64, 1, 1L))
    val rows = fixtures.map { case (id, w, h, seed) =>
      (id, "image", Multimodal.pngBytes(w, h, seed))
    }
    val m = rows.toDF("media_id", "kind", "payload")
    val out = Multimodal.decode(m, Multimodal.ImageIoCodec)
      .orderBy("media_id").collect()
    fixtures.zip(out).foreach { case ((id, w, h, seed), r) =>
      assert(r.getAs[Long]("media_id") === id)
      assert(r.getAs[Int]("width") === w, s"true width for media $id")
      assert(r.getAs[Int]("height") === h, s"true height for media $id")
      // feature must match a direct single-JVM decode of the same bytes
      val (_, _, f) = Multimodal.ImageIoCodec.decode("image", Multimodal.pngBytes(w, h, seed))
      assert(r.getAs[Seq[Double]]("feature") === f.toSeq)
      // per-strip means are in [0, 255]; when h < 8 only strips floor(y*8/h)
      // are populated and the rest report exactly 0
      assert(f.forall(v => v >= 0.0 && v <= 255.0))
      if (h < 8) {
        val populated = (0 until h).map(y => y * 8 / h).toSet
        (0 until 8).filterNot(populated).foreach(i =>
          assert(f(i) === 0.0, s"empty strip $i of media $id reports 0"))
      }
    }
  }

  test("ImageIoCodec falls back to PortableCodec on non-image and corrupt payloads") {
    val text = "not an image".getBytes("UTF-8")
    def same(kind: String): Unit = {
      val (w1, h1, f1) = Multimodal.ImageIoCodec.decode(kind, text)
      val (w2, h2, f2) = Multimodal.PortableCodec.decode(kind, text)
      assert(w1 === w2); assert(h1 === h2); assert(f1.toSeq === f2.toSeq)
    }
    same("audio")
    // image-kinded garbage must degrade, never throw (poison rows at scale)
    same("image")
  }

  test("ahash: documented stripe arithmetic, perturbation robustness, banded pair recovery") {
    // 64 bytes, 8-bit hash: stripes 0-3 hold 200s, stripes 4-7 hold 10s —
    // global mean 105, so bits 0-3 set, 4-7 clear: ahash = 0x0F exactly
    val base = Array.tabulate(64)(j => if (j % 8 < 4) 200.toByte else 10.toByte)
    val bumped = base.clone(); bumped(17) = 201.toByte // stripe 1, +1: far from threshold
    val other = Array.tabulate(64)(j => if (j % 8 < 4) 10.toByte else 200.toByte)
    val df = Seq((1L, base), (2L, bumped), (3L, other))
      .toDF("media_id", "payload")
    val got = Multimodal.ahash(df, bits = 8)
      .select($"media_id", $"ahash").as[(Long, Long)].collect().toMap
    assert(got(1L) === 0x0FL, s"ahash = ${got(1L).toBinaryString}")
    assert(got(3L) === 0xF0L, s"inverted payload ahash = ${got(3L).toBinaryString}")
    // a small byte perturbation leaves every stripe on its side of the
    // global mean: identical fingerprint, Hamming 0
    assert(got(2L) === got(1L))
    // and the banded pair search recovers exactly the near pair (1,2);
    // (1,3)/(2,3) sit at Hamming 8 — no shared band, never candidates
    val pairs = graft.operators.Dedup.hammingPairs(
        Multimodal.ahash(df, bits = 8), "media_id", "ahash",
        bits = 8, nBands = 4, maxHamming = 3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("hammingCrossPairs: probe×standing complete at the pigeonhole bound, no standing self-pairs") {
    // 8-bit hashes, 4×2-bit bands, maxHamming 3: standing holds 0x0F and
    // its inversion 0xF0 (Hamming 8 apart — a SELF pair the cross probe
    // must never emit); probes hold exact twin, distance-1, distance-3
    // (caught: 3 flips leave ≥1 of 4 bands intact) and distance-4 across
    // all four bands (legitimately missed at this radius, and filtered by
    // the popcount even when bands collide)
    val standing = Seq((101L, 0x0FL), (102L, 0xF0L)).toDF("media_id", "h")
    val probe = Seq(
      (1L, 0x0FL),  // twin of 101          -> hamming 0
      (2L, 0x0EL),  // 1 bit off 101        -> hamming 1
      (3L, 0x3BL),  // bits 2,4,5 flipped   -> hamming 3 (band0 intact)
      (4L, 0xAAL)   // hamming 4 from both  -> outside the radius
    ).toDF("media_id", "h")
    val got = graft.operators.Dedup.hammingCrossPairs(
        probe, standing, "media_id", "h", bits = 8, nBands = 4, maxHamming = 3)
      .select($"a", $"b", $"hamming").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 101L, 0L), (2L, 101L, 1L), (3L, 101L, 3L)))
    // the standing side is never self-paired (101,102 share no band anyway,
    // but even band-colliding standing rows must not pair): probe with an
    // empty frame returns nothing
    val none = graft.operators.Dedup.hammingCrossPairs(
      probe.limit(0), standing, "media_id", "h", bits = 8, nBands = 4, maxHamming = 3)
    assert(none.count() === 0L)
  }

  test("png round trip is lossless: re-encoding decoded pixels is stable") {
    val bytes = Multimodal.pngBytes(9, 4, 99L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val again = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    }
    for (y <- 0 until 4; x <- 0 until 9)
      assert(img.getRGB(x, y) === again.getRGB(x, y))
  }
}
