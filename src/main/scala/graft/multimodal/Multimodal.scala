package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side plumbing — schema, partition-friendly batch iteration,
  * deterministic outputs — is real and tested. The codec itself is a STUB
  * (`StubCodec`): the container has no image/audio libraries, so "decoding"
  * derives deterministic pseudo-metadata and features from the bytes. A real
  * deployment swaps [[Codec]] for one backed by an actual library (or
  * `mapInPandas`+PIL on the Python side); nothing else changes.
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
