package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Three [[Codec]]s ship:
  *   - [[ImageIoCodec]] — REAL image decode via the JDK's `javax.imageio`
  *     (PNG/BMP/GIF/JPEG): true pixel dimensions and pixel-derived features.
  *   - [[PortableCodec]] — deterministic byte-level stand-in whose arithmetic
  *     is expressible in SQL, so the decode stage is oracle-checkable
  *     end-to-end (`mm_decode_meta`).
  *   - [[StubCodec]] — the original fake, kept for plumbing tests.
  * Audio/video decode remains a stand-in (no codec libraries in this
  * environment); a deployment swaps in a library-backed [[Codec]] and
  * nothing else changes.
  *
  * Scale notes: media blobs ride executor-side only (no collect); the
  * per-partition iterator keeps one batch of decoded frames in memory at a
  * time; downstream joins should go through the extracted metadata/feature
  * columns, never the binary payload.
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),    // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Decoded-feature row produced by the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Pluggable decoder: bytes → (width, height, feature vector). */
  trait Codec extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Double])
  }

  /** Deterministic fake standing in for a real image/audio codec. */
  object StubCodec extends Codec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.floorMod(h, 960)
      val height = 64 + math.floorMod(h / 7, 960)
      // fake 8-dim feature: byte-histogram moments, deterministic per payload
      val feature = Array.tabulate(8) { i =>
        if (payload.isEmpty) 0.0
        else payload.iterator.zipWithIndex
          .filter { case (_, j) => j % 8 == i }
          .map { case (b, _) => (b & 0xff).toDouble }
          .foldLeft(0.0)(_ + _) / payload.length
      }
      (width, height, feature)
    }
  }

  /** Deterministic codec whose arithmetic is expressible in ANSI-ish SQL,
    * so decode output can be oracle-checked end-to-end (the one thing
    * [[StubCodec]]'s JVM-specific `Arrays.hashCode` can't do): dimensions
    * derive from the payload's md5, the 8-dim feature is the mean of bytes
    * at each position mod 8. Still a stand-in for a real media library —
    * but it makes the mapPartitions decode path a first-class citizen of
    * the correctness gate instead of engine-tests-only.
    */
  object PortableCodec extends Codec {
    // one digest instance per executor thread — decode runs per row inside
    // mapPartitions, and a fresh MessageDigest + hex string round-trip per
    // row is pure garbage on the hot path
    private val digest = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val md = digest.get()
      md.reset()
      val d = md.digest(payload)
      // first/second 4 digest bytes big-endian unsigned == the values of
      // parsing md5-hex chars 1-8 / 9-16 (what the SQL oracle computes)
      def u32(off: Int): Long =
        ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
          ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
      val width = 64 + (u32(0) % 960).toInt
      val height = 64 + (u32(4) % 960).toInt
      val n = payload.length
      val feature = Array.tabulate(8) { i =>
        if (n == 0) 0.0
        else {
          // integer partial sums are exact in a double, so this matches the
          // oracle's list_sum regardless of either side's summation order
          var s = 0.0
          var j = i
          while (j < n) { s += (payload(j) & 0xff).toDouble; j += 8 }
          s / n
        }
      }
      (width, height, feature)
    }
  }

  /** Real image decode on the JDK's `javax.imageio` (PNG, BMP, GIF, JPEG —
    * no external dependency): true pixel width/height, and an 8-dim feature
    * of per-strip mean intensities (image split into 8 horizontal strips,
    * each value the mean of (r+g+b)/3 over the strip's pixels — integer
    * channel sums are exact in a double, so the feature is bit-deterministic
    * regardless of traversal order).
    *
    * Non-image kinds and undecodable payloads fall back to [[PortableCodec]]
    * — decode never throws on a bad blob (at 100 TB some blobs WILL be
    * corrupt; a poison row must not kill the stage).
    */
  object ImageIoCodec extends Codec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Double]) = {
      if (kind != "image" || payload.isEmpty)
        return PortableCodec.decode(kind, payload)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) return PortableCodec.decode(kind, payload)
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](8)
      val counts = new Array[Long](8)
      var y = 0
      while (y < h) {
        val strip = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sums(strip) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          counts(strip) += 1
          x += 1
        }
        y += 1
      }
      val feature = Array.tabulate(8) { i =>
        if (counts(i) == 0L) 0.0 else sums(i).toDouble / (3.0 * counts(i))
      }
      (w, h, feature)
    }
  }

  /** Deterministic RGB PNG bytes: pixel (x, y) colored by a splitmix-style
    * mix of (seed, y*width+x). PNG is lossless and TYPE_INT_RGB is exact, so
    * an encode→decode round trip recovers the same pixels — the test fixture
    * for [[ImageIoCodec]].
    */
  def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, "png dimensions must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var z = seed + (y.toLong * width + x) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode stage: per-partition batch iteration over the binary column
    * (the Scala analog of a `mapInPandas` batch UDF — one batch of decoded
    * rows in flight per partition, payload never leaves the executor).
    *
    * `passthrough` columns (e.g. `meta.n_bytes`) ride through the decode
    * untouched and come out after the decoded fields — re-joining the media
    * table afterwards just to recover metadata would be a media-sized
    * shuffle at 100 TB, so columns already in hand stay in hand.
    */
  def decode(media: DataFrame, codec: Codec = StubCodec,
             passthrough: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val projected = media.select(
      (Seq(col("media_id"), col("kind"), col("payload")) ++ passthrough): _*)
    val passFields = projected.schema.fields.drop(3)
    // case-insensitive like Spark's default column resolution — a "Width"
    // passthrough would otherwise pass this check and then blow up as an
    // ambiguous reference downstream
    val reserved = decodedSchema.fieldNames.map(_.toLowerCase).toSet
    require(passFields.forall(f => !reserved.contains(f.name.toLowerCase)),
      s"passthrough columns collide with decoded fields: ${passFields.map(_.name).mkString(",")}")
    val outSchema = StructType(decodedSchema.fields ++ passFields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val nPass = passFields.length
    val out: Dataset[Row] = projected.mapPartitions { rows =>
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val (w, h, f) = codec.decode(r.getAs[String]("kind"), payload)
        Row.fromSeq(Seq(r.getAs[Long]("media_id"), r.getAs[String]("kind"), w, h, f.toSeq) ++
          (0 until nPass).map(i => r.get(3 + i)))
      }
    }(enc)
    out
  }

  /** Resize stub: recompute metadata for a target box, payload untouched
    * (a real codec would transcode; the plumbing — narrow transform, no
    * shuffle — is what matters here).
    */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sample stub for video: emit every `stride`-th synthetic frame
    * index up to `maxFrames` (explode-shaped fan-out, the real pattern for
    * per-frame feature extraction).
    */
  def sampleFrames(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    decoded.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit((maxFrames - 1) * stride), lit(stride))))

  /** PAYLOAD-derived frame sampling + per-frame feature extraction: the
    * payload is treated as `n_bytes / frameBytes` fixed-size frames (tail
    * remainder dropped, as a real container's truncated last frame would
    * be), every `stride`-th frame is decoded, and each sampled frame emits
    * one row with its byte-mean feature. This is the video analog of the
    * [[decode]] stage — same per-partition batch iteration (`mapInPandas`
    * shape), payload never leaves the executor, fan-out rows carry only
    * scalar features.
    *
    * The frame feature is a mean of integer byte values — exact in a double
    * regardless of summation order — so the stage is oracle-reproducible
    * (`mm_frame_sample`), like [[PortableCodec]] is for [[decode]].
    *
    * Scale shape: one narrow pass over the media table; output size is
    * `ceil(n_frames / stride)` rows per blob, bounded by payload size — the
    * sampling ratio is the knob that keeps the frame relation a fixed
    * fraction of the corpus at 100 TB.
    */
  def frameFeatures(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("f_mean", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val nFrames = payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { fi =>
          var s = 0.0
          var j = fi * frameBytes
          val end = j + frameBytes
          while (j < end) { s += (payload(j) & 0xff).toDouble; j += 1 }
          Row(r.getAs[Long]("media_id"), fi, nFrames.toLong, s / frameBytes)
        }
      }
    }(enc)
  }

  /** Average-hash (aHash) perceptual fingerprint of the opaque payload —
    * the classic image near-dup signature (downsample, threshold each cell
    * against the global mean), applied at byte granularity so it works on
    * any modality this environment can't truly decode: bit i of the
    * `bits`-bit hash is 1 iff the mean of bytes in stripe i (positions
    * ≡ i mod bits) exceeds the whole-payload mean. The threshold compares
    * exact integer cross-products (stripe_sum·n > total_sum·stripe_count)
    * so no float mean ever materializes and the bit pattern is
    * engine-reproducible. A real deployment swaps the byte stripes for
    * decoded-pixel cells ([[ImageIoCodec]]'s strip means are exactly that
    * shape) and nothing downstream changes.
    *
    * Same per-partition batch shape as [[decode]]: one narrow pass,
    * payload never leaves the executor, output is (media_id, ahash,
    * n_bytes) — 8 bytes of fingerprint per blob for the downstream
    * Hamming-banded pair search.
    */
  def ahash(media: DataFrame, bits: Int = 60): DataFrame = {
    require(bits > 0 && bits <= 60, s"ahash bits must be in [1, 60], got $bits")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      val sums = new Array[Long](bits)
      val counts = new Array[Long](bits)
      rows.map { r =>
        val p = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        // the per-stripe mean comparison below is sums(i)*len > total*counts(i)
        // in Long arithmetic; both products are bounded by 255·len²/bits, which
        // stays under 2^63 only while len < ~1.47e9 bytes. Past that the
        // products wrap and hash bits silently flip — fail loudly instead
        // (a payload this size should be chunked upstream, not fingerprinted
        // whole).
        require(p.length.toLong < (1L << 30),
          s"ahash payload is ${p.length} bytes; the stripe-mean products " +
          "overflow Long past ~1 GiB — chunk oversized media before hashing")
        java.util.Arrays.fill(sums, 0L)
        java.util.Arrays.fill(counts, 0L)
        var total = 0L
        var j = 0
        while (j < p.length) {
          val v = (p(j) & 0xff).toLong
          sums(j % bits) += v
          counts(j % bits) += 1
          total += v
          j += 1
        }
        var h = 0L
        var i = 0
        while (i < bits) {
          if (counts(i) > 0 && sums(i) * p.length > total * counts(i)) h |= 1L << i
          i += 1
        }
        Row(r.getAs[Long]("media_id"), h, p.length.toLong)
      }
    }(enc)
  }

  /** Build a media table from any (id, text) source — test/demo helper that
    * treats utf-8 bytes as the opaque payload.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
                    kind: String, source: String): DataFrame =
    mediaFromText(df, idCol, textCol, lit(kind), source)

  /** Column-kind variant: per-row media kind (image/audio/video). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
                    kind: org.apache.spark.sql.Column, source: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      kind.as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit(source).as("source"),
             octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))
}
