package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal plumbing: build a deterministic binary media
  * table from `documents` (utf-8 payloads — the fixture bytes), run the real
  * `mapPartitions` decode stage with [[Multimodal.PortableCodec]], and the
  * resize-metadata stage on top. The DuckDB oracle recomputes the same
  * md5-derived dimensions and byte-moment feature directly from the text
  * (the fixture is pure ASCII, so `ascii(substring(text, j, 1))` IS byte
  * j-1 of the payload).
  *
  * This makes the binary-column path — schema, per-partition batch decode,
  * narrow metadata transforms — subject to the same rows/schema/hash gate
  * as every other operator family, not just engine tests.
  */
object MultimodalQueries {

  /** mm_decode_meta — decode + resize metadata for every document-derived
    * media blob: (media_id, kind, n_bytes, width, height, f0, out_width,
    * out_height).
    */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1)
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", kind, "documents")
    // n_bytes rides through the decode as a passthrough column — no
    // media-sized re-join to recover metadata the frame already had
    val decoded = Multimodal.decode(media, Multimodal.PortableCodec,
      passthrough = Seq(col("meta.n_bytes").as("n_bytes")))
    val resized = Multimodal.resizeMeta(decoded, 256)
    resized
      .select(col("media_id"), col("kind"), col("n_bytes"),
              col("width"), col("height"),
              round(element_at(col("feature"), 1), 4).as("f0"),
              col("out_width"), col("out_height"))
      .orderBy("media_id")
  }

  /** mm_frame_sample — video-kind blobs as 16-byte frames, every 4th frame
    * sampled, per-frame byte-mean feature: (media_id, frame_idx, n_frames,
    * f_mean). The frame fan-out runs in the same per-partition batch shape
    * as the decode stage; the oracle recomputes each sampled frame's mean
    * from the same bytes via `ascii(substring(...))` (ASCII fixture).
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") % 3 === 2)
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "video", "documents")
    Multimodal.frameFeatures(media, frameBytes = 16, stride = 4)
      .select(col("media_id"), col("frame_idx"), col("n_frames"),
              round(col("f_mean"), 4).as("f_mean"))
      .orderBy("media_id", "frame_idx")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> (decodeMeta _),
    "mm_frame_sample" -> (frameSample _),
  )

  val oracle: Map[String, String] = Map(
    "mm_decode_meta" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |         text, length(text) AS n
        |  FROM documents),
        |f AS (
        |  SELECT media_id, kind, CAST(n AS BIGINT) AS n_bytes,
        |    CAST(64 + CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) % 960 AS INTEGER) AS width,
        |    CAST(64 + CAST('0x' || substring(md5(text), 9, 8) AS BIGINT) % 960 AS INTEGER) AS height,
        |    CASE WHEN n = 0 THEN 0.0 ELSE
        |      round(list_sum(list_transform(range(1, n + 1),
        |        j -> CASE WHEN (j - 1) % 8 = 0
        |                  THEN ascii(substring(text, CAST(j AS INTEGER), 1))
        |                  ELSE 0 END)) / n, 4) END AS f0
        |  FROM m)
        |SELECT media_id, kind, n_bytes, width, height, f0,
        |  CAST(ceil(width * least(1.0, 256.0 / greatest(width, height))) AS INTEGER) AS out_width,
        |  CAST(ceil(height * least(1.0, 256.0 / greatest(width, height))) AS INTEGER) AS out_height
        |FROM f ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id, text, CAST(n // 16 AS BIGINT) AS n_frames
        |  FROM m WHERE n >= 16),
        |idx AS (
        |  SELECT media_id, text, n_frames,
        |         CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
        |  FROM fr)
        |SELECT media_id, frame_idx, n_frames,
        |  round(list_sum(list_transform(range(1, 17),
        |    j -> ascii(substring(text, CAST(frame_idx * 16 + j AS INTEGER), 1))))
        |    / 16.0, 4) AS f_mean
        |FROM idx ORDER BY media_id, frame_idx""".stripMargin,
  )
}
